package graft.queries

import graft.{GQuery, QueryPack}
import graft.engine.{GraftSession, SnowflakeTypes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Statement-layer operators (SURVEY §2.A) exercised through the
  * correctness gate: every query here enters as **Snowflake-dialect SQL**
  * through [[GraftSession.sql]] — dialect rewrite, identifier
  * normalization, table resolution, routing, DDL/DML — and must still
  * hash-match the ANSI oracle on DuckDB. */
object SnowflakeSql extends QueryPack {

  private def session(s: SparkSession, dir: String): GraftSession = {
    val gs = new GraftSession(s)
    gs.attachLake(dir)
    gs
  }

  val all: Seq[GQuery] = Seq(

    GQuery("snow01_variant_path", Some("""
      SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        count(*) AS n
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
      GROUP BY 1, 2 ORDER BY event_type, k""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT event_type, props:k::bigint AS k, count(*) AS n
        FROM events
        WHERE props:k::bigint > 90
        GROUP BY 1, 2 ORDER BY event_type, k""")
    },

    GQuery("snow02_iff_cast", Some("""
      SELECT CASE WHEN o_totalprice > 250000 THEN 'hi' ELSE 'lo' END AS tier,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY tier""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT IFF(o_totalprice > 250000, 'hi', 'lo') AS tier,
          count(*) AS n,
          sum(o_totalprice::number(12,2))::double AS total
        FROM orders GROUP BY 1 ORDER BY tier""")
    },

    GQuery("snow03_ctas_roundtrip", Some("""
      SELECT o_orderpriority AS priority, count(*) AS n
      FROM orders WHERE o_totalprice > 200000
      GROUP BY 1 ORDER BY priority""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TEMP TABLE pricey AS
          SELECT * FROM orders WHERE o_totalprice > 200000;
        SELECT o_orderpriority AS priority, count(*) AS n
        FROM pricey GROUP BY 1 ORDER BY priority;""")
    },

    GQuery("snow04_copy_into", Some("""
      SELECT r_regionkey AS rkey, r_name AS rname
      FROM region ORDER BY rkey""")) { (s, dir) =>
      val gs = session(s, dir)
      val stageDir = Files.createTempDirectory("graft_stage").toString
      graft.Tables.load(s, dir, "region")
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$stageDir/objects")
      gs.sql(s"CREATE STAGE verify_stage URL='$stageDir'")
      gs.sql("""
        CREATE OR REPLACE TABLE region_copy (r_regionkey INT, r_name VARCHAR);
        COPY INTO region_copy FROM @verify_stage/objects
          FILE_FORMAT = (SKIP_HEADER = 1);""")
      gs.sql("""SELECT r_regionkey AS rkey, r_name AS rname
                FROM region_copy ORDER BY rkey""")
    },

    GQuery("snow05_datetime_tokens", Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY ym""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT TO_CHAR(o_orderdate, 'YYYY-MM') AS ym, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY ym""")
    },

    GQuery("snow06_use_and_insert", Some("""
      SELECT n_name AS nation, count(*) AS n_suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY nation""")) { (s, dir) =>
      session(s, dir).sql("""
        USE DATABASE graft;
        USE SCHEMA public;
        CREATE OR REPLACE TEMP TABLE supp_nation AS
          SELECT n_name AS nation, count(*) AS n_suppliers
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY 1;
        SELECT nation, n_suppliers FROM supp_nation ORDER BY nation;""")
    },

    GQuery("snow07_semi_structured_wire", Some("""
      SELECT to_json([l_returnflag, l_linestatus]) AS pair, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY pair""")) { (s, dir) =>
      val df = session(s, dir).sql("""
        SELECT ARRAY_CONSTRUCT(l_returnflag, l_linestatus) AS pair, count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY 1""")
      SnowflakeTypes.toWire(df)
    },

    // The reference's canonical per-type round-trip fixture
    // (ALL_COLUMNS_QUERY, tests/integration/utils.py:35-84), re-expressed
    // over the exercised type surface; enters as Snowflake SQL (casts via
    // ::, VARIANT via PARSE_JSON/:, semi-structured via *_CONSTRUCT) and
    // must match DuckDB's ANSI equivalents bit-for-bit at the wire.
    GQuery("snow09_type_matrix", Some("""
      SELECT
        CAST(CAST(123 AS DECIMAL(10,2)) AS DOUBLE) AS num_dec,
        CAST(42 AS INTEGER) AS num_int,
        CAST(42 AS BIGINT) AS num_big,
        CAST(42 AS SMALLINT) AS num_small,
        CAST(42 AS TINYINT) AS num_tiny,
        CAST(4.25 AS DOUBLE) AS num_float,
        CAST('txt' AS VARCHAR) AS str_text,
        CAST(TRUE AS BOOLEAN) AS bool_v,
        CAST(CAST('2024-03-01' AS DATE) AS VARCHAR) AS date_s,
        CAST(CAST('2024-03-01 12:34:56' AS TIMESTAMP) AS VARCHAR) AS ts_s,
        hex(CAST('ab' AS BLOB)) AS bin_hex,
        CAST(json_extract_string('{"k": 7}', '$.k') AS INT) AS var_k,
        to_json([1, 2, 3]) AS arr,
        to_json({'a': 1}) AS obj""")) { (s, dir) =>
      val df = session(s, dir).sql("""
        SELECT
          123::NUMBER(10,2)::DOUBLE AS num_dec,
          42::INT AS num_int,
          42::BIGINT AS num_big,
          42::SMALLINT AS num_small,
          42::BYTEINT AS num_tiny,
          4.25::FLOAT AS num_float,
          'txt'::TEXT AS str_text,
          TRUE::BOOLEAN AS bool_v,
          '2024-03-01'::DATE::VARCHAR AS date_s,
          '2024-03-01 12:34:56'::TIMESTAMP::VARCHAR AS ts_s,
          hex('ab'::BINARY) AS bin_hex,
          PARSE_JSON('{"k": 7}'):k::int AS var_k,
          ARRAY_CONSTRUCT(1, 2, 3) AS arr,
          OBJECT_CONSTRUCT('a', 1) AS obj""")
      SnowflakeTypes.toWire(df)
    },

    GQuery("snow10_qualify", Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 2
      ORDER BY o_orderpriority, o_orderkey""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) <= 2
        ORDER BY o_orderpriority, o_orderkey""")
    },

    GQuery("snow11_flatten", Some("""
      SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS INT) AS idx,
        CAST(unnest(l) AS INT) AS v
      FROM (SELECT doc_id, list_value(n_chars, doc_id + 1) AS l
            FROM documents WHERE doc_id < 50) t
      ORDER BY doc_id, idx""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT doc_id, f.index AS idx, f.value::int AS v
        FROM (SELECT doc_id,
                PARSE_JSON('[' || n_chars || ',' || (doc_id + 1) || ']') AS arr
              FROM documents WHERE doc_id < 50) t,
          LATERAL FLATTEN(input => arr) f
        ORDER BY doc_id, idx""")
    },

    GQuery("snow12_fn_extras", Some("""
      SELECT c_mktsegment,
        string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS keys_csv,
        split_part(min(c_name), '#', 2) AS first_name_num,
        round(coalesce(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) /
          nullif(count(*), 0), 0), 4) AS avg_bal
      FROM customer WHERE c_custkey <= 40
      GROUP BY 1 ORDER BY c_mktsegment""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT c_mktsegment,
          LISTAGG(c_custkey::VARCHAR, ',') WITHIN GROUP (ORDER BY c_custkey) AS keys_csv,
          SPLIT_PART(min(c_name), '#', 2) AS first_name_num,
          round(DIV0(sum(c_acctbal::NUMBER(12,2))::DOUBLE, count(*)), 4) AS avg_bal
        FROM customer WHERE c_custkey <= 40
        GROUP BY 1 ORDER BY c_mktsegment""")
    },

    GQuery("snow08_to_query_unwrap", Some("""
      SELECT priority, n FROM (
        SELECT o_orderpriority AS priority, count(*) AS n FROM orders GROUP BY 1
      ) WHERE n > 0 ORDER BY priority""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT priority, n FROM table(to_query(
          'SELECT o_orderpriority AS priority, count(*) AS n FROM orders GROUP BY 1'))
        WHERE n > 0 ORDER BY priority""")
    },

    // UPDATE + DELETE + MERGE copy-on-write (beyond reference parity —
    // the reference skips these, `tests/integration/transform.py:6-25`).
    // Oracle replays the same mutations declaratively.
    GQuery("snow13_dml", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey <= 500),
      upd AS (
        SELECT k, CASE WHEN k % 10 = 0 THEN v + 1 ELSE v END AS v FROM base),
      del AS (SELECT * FROM upd WHERE NOT (k % 7 = 0)),
      src AS (
        SELECT o_orderkey AS k, o_totalprice AS v FROM orders
        WHERE o_orderkey BETWEEN 400 AND 600),
      merged AS (
        SELECT d.k, CASE WHEN s.k IS NOT NULL THEN s.v * 2 ELSE d.v END AS v
        FROM del d LEFT JOIN src s ON d.k = s.k
        UNION ALL
        SELECT s.k, s.v FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.k = s.k))
      SELECT k, CAST(v AS DOUBLE) AS v FROM merged ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TEMP TABLE t_dml AS
          SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey <= 500;
        UPDATE t_dml SET v = v + 1 WHERE k % 10 = 0;
        DELETE FROM t_dml WHERE k % 7 = 0;
        MERGE INTO t_dml t USING (
            SELECT o_orderkey AS k, o_totalprice AS v FROM orders
            WHERE o_orderkey BETWEEN 400 AND 600) s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v * 2
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);
        SELECT k, v::double AS v FROM t_dml ORDER BY k;""")
    },

    GQuery("snow14_fn_conversions", Some("""
      SELECT
        CASE WHEN o_orderpriority = '1-URGENT' THEN 'u'
             WHEN o_orderpriority = '2-HIGH' THEN 'h'
             ELSE 'other' END AS pri,
        CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
        strftime(o_orderdate, '%a') AS dn,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2, 3 ORDER BY pri, yr, dn""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT
          DECODE(o_orderpriority, '1-URGENT', 'u', '2-HIGH', 'h', 'other') AS pri,
          DATE_PART(year, o_orderdate)::bigint AS yr,
          DAYNAME(o_orderdate) AS dn,
          count(*) AS n,
          sum(TO_NUMBER(o_totalprice, 12, 2))::double AS total
        FROM orders GROUP BY 1, 2, 3 ORDER BY pri, yr, dn""")
    },

    // PIVOT rides the Spark SQL pass-through; SPLIT_TO_TABLE and
    // GENERATOR/SEQ4 are rewriter table functions.
    GQuery("snow15_pivot", Some("""
      SELECT o_orderpriority AS pri,
        count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_o,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_f,
        count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_p
      FROM orders GROUP BY 1 ORDER BY pri""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT * FROM (
          SELECT o_orderpriority AS pri, o_orderstatus AS st FROM orders)
        PIVOT (count(st) FOR st IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        ORDER BY pri""")
    },

    GQuery("snow16_split_generator", Some("""
      SELECT g.s, parts.idx, parts.part
      FROM (SELECT unnest(generate_series(0, 2)) AS s) g,
      LATERAL (SELECT CAST(generate_subscripts(string_split('a,b,c', ','), 1) AS BIGINT) AS idx,
                      unnest(string_split('a,b,c', ',')) AS part) parts
      ORDER BY g.s, parts.idx""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT g.s, f.index AS idx, f.value AS part
        FROM (SELECT seq4() AS s FROM TABLE(GENERATOR(ROWCOUNT => 3))) g,
        LATERAL SPLIT_TO_TABLE('a,b,c', ',') f
        ORDER BY g.s, f.index""")
    },

    // CREATE ICEBERG TABLE AS + INSERT append through the real spec-layout
    // writer/reader (A6/A9/A12; `sources/IcebergLite.scala`).
    GQuery("snow17_iceberg_roundtrip", Some("""
      SELECT o_orderpriority AS p, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey <= 400
      GROUP BY 1 ORDER BY p""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ice_g AS
          SELECT o_orderkey AS k, o_orderpriority AS p, o_totalprice AS v
          FROM orders WHERE o_orderkey <= 300;
        INSERT INTO ice_g
          SELECT o_orderkey, o_orderpriority, o_totalprice
          FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 400;
        SELECT p, count(*) AS n, sum(v::number(12,2))::double AS total
        FROM ice_g GROUP BY 1 ORDER BY p;""")
    },

    // Unload → named FILE FORMAT → reload round-trip (the COPY path's
    // mirror): a result leaves through the distributed writer and comes
    // back bit-identical through the option map.
    GQuery("snow18_unload_roundtrip", Some("""
      SELECT r_regionkey AS rkey, r_name AS rname
      FROM region ORDER BY rkey""")) { (s, dir) =>
      val gs = session(s, dir)
      val stageDir = Files.createTempDirectory("graft_unload_gate").toString
      gs.sql(s"CREATE STAGE gate_unload URL='$stageDir'")
      gs.sql("""
        CREATE OR REPLACE FILE FORMAT gate_csv TYPE = CSV FIELD_DELIMITER = '|';
        COPY INTO @gate_unload/r FROM (SELECT r_regionkey, r_name FROM region)
          FILE_FORMAT = (FORMAT_NAME = 'gate_csv') HEADER = TRUE OVERWRITE = TRUE;
        CREATE OR REPLACE TABLE gate_region_u (r_regionkey INT, r_name VARCHAR);
        COPY INTO gate_region_u FROM @gate_unload/r
          FILE_FORMAT = (FORMAT_NAME = 'gate_csv', SKIP_HEADER = 1);""")
      gs.sql("""SELECT r_regionkey AS rkey, r_name AS rname
                FROM gate_region_u ORDER BY rkey""")
    },

    // Zero-copy CLONE + TRUNCATE + ALTER on copy-on-write snapshots: the
    // clone must keep the pre-truncate rows and survive schema evolution.
    GQuery("snow19_clone_alter", Some("""
      SELECT n_nationkey AS k, n_name AS nm, CAST(NULL AS VARCHAR) AS tag
      FROM nation ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE nat_src AS SELECT n_nationkey, n_name FROM nation;
        CREATE OR REPLACE TABLE nat_clone CLONE nat_src;
        TRUNCATE TABLE nat_src;
        ALTER TABLE nat_clone ADD COLUMN tag VARCHAR;
        ALTER TABLE nat_clone RENAME TO nat_gold;
        SELECT n_nationkey AS k, n_name AS nm, tag FROM nat_gold ORDER BY k;""")
    },

    GQuery("snow20_ratio_to_report", Some("""
      SELECT o_orderpriority AS pri,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) /
          sum(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)) OVER (), 6)
          AS share
      FROM orders GROUP BY 1 ORDER BY pri""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority AS pri,
          round(RATIO_TO_REPORT(sum(o_totalprice::number(12,2))::double) OVER (), 6)
            AS share
        FROM orders GROUP BY 1 ORDER BY pri""")
    },

    // SQL-bodied CREATE FUNCTION: expanded as a macro before the dialect
    // rewrite, so the body participates in Catalyst optimization instead
    // of opaque per-row UDF calls.
    GQuery("snow21_sql_udf", Some("""
      SELECT l_returnflag AS flag,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY 1 ORDER BY flag""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE FUNCTION disc_price(p NUMBER, d NUMBER) RETURNS NUMBER
          AS 'p::number(12,2) * (1 - d::number(12,2))';
        SELECT l_returnflag AS flag,
          sum(disc_price(l_extendedprice, l_discount))::double AS rev
        FROM lineitem GROUP BY 1 ORDER BY flag;""")
    },

    // Time travel: CTAS → COW DELETE → read both the current state and the
    // pre-DELETE snapshot via BEFORE(STATEMENT => LAST_QUERY_ID()). The
    // oracle recomputes both counts from the base table.
    GQuery("snow22_time_travel", Some("""
      SELECT (SELECT count(*) FROM region WHERE r_regionkey < 2) AS now_n,
             (SELECT count(*) FROM region) AS then_n""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE tt_region AS SELECT * FROM region;
        DELETE FROM tt_region WHERE r_regionkey >= 2;
        SELECT (SELECT count(*) FROM tt_region) AS now_n,
               (SELECT count(*) FROM tt_region
                BEFORE(STATEMENT => LAST_QUERY_ID())) AS then_n;""")
    },

    // Ordered-set aggregates: MEDIAN and PERCENTILE_CONT WITHIN GROUP —
    // both engines use linear interpolation, so exact values compare.
    GQuery("snow23_percentiles", Some("""
      SELECT l_returnflag AS flag,
        round(CAST(median(l_quantity) AS DOUBLE), 6) AS med_qty,
        round(CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)
          AS DOUBLE), 6) AS p25_qty,
        round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
          AS DOUBLE), 6) AS p90_price
      FROM lineitem GROUP BY 1 ORDER BY flag""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT l_returnflag AS flag,
          round(MEDIAN(l_quantity)::double, 6) AS med_qty,
          round(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity)::double, 6)
            AS p25_qty,
          round(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice)::double, 6)
            AS p90_price
        FROM lineitem GROUP BY 1 ORDER BY flag""")
    },

    // UNPIVOT: wide aggregate → (key, metric, value) long form; the oracle
    // recreates the fold with UNION ALL.
    GQuery("snow24_unpivot", Some("""
      WITH agg AS (
        SELECT o_orderpriority AS pri,
          CAST(count(*) AS DOUBLE) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1)
      SELECT pri, metric, val FROM (
        SELECT pri, 'n_orders' AS metric, n_orders AS val FROM agg
        UNION ALL
        SELECT pri, 'total' AS metric, total AS val FROM agg)
      ORDER BY pri, metric""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH agg AS (
          SELECT o_orderpriority AS pri,
            count(*)::double AS n_orders,
            sum(o_totalprice::number(12,2))::double AS total
          FROM orders GROUP BY 1)
        SELECT pri, lower(metric) AS metric, val
        FROM agg UNPIVOT (val FOR metric IN (n_orders, total))
        ORDER BY pri, metric""")
    },

    // RESULT_SCAN(LAST_QUERY_ID()): a later statement re-reads an earlier
    // statement's result from the session result cache.
    GQuery("snow25_result_scan", Some("""
      SELECT o_orderpriority AS pri, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY pri""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority AS pri, count(*) AS n FROM orders GROUP BY 1;
        SELECT pri, n FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))
        ORDER BY pri;""")
    },

    // DROP → UNDROP: the COW snapshot outlives the registry pointer, so
    // restore is a metadata-only re-point (Snowflake semantics).
    GQuery("snow26_undrop", Some("""
      SELECT count(*) AS n FROM nation""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE und_n AS SELECT * FROM nation;
        DROP TABLE und_n;
        UNDROP TABLE und_n;
        SELECT count(*) AS n FROM und_n;""")
    },

    // Recursive CTE (Snowflake WITH RECURSIVE): walk the region → nation
    // → customer hierarchy, counting members per root and level. Spark 4
    // executes the recursion natively (UnionLoop); DuckDB runs the same
    // ANSI text.
    GQuery("snow27_recursive_cte", Some("""
      WITH RECURSIVE nodes AS (
        SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS id,
               CAST(NULL AS VARCHAR) AS parent FROM region
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR) FROM nation
        UNION ALL
        SELECT 'C' || CAST(c_custkey AS VARCHAR),
               'N' || CAST(c_nationkey AS VARCHAR) FROM customer
        WHERE c_custkey <= 300),
      walk AS (
        SELECT id, id AS root, 1 AS lvl FROM nodes WHERE parent IS NULL
        UNION ALL
        SELECT n.id, w.root, w.lvl + 1
        FROM nodes n JOIN walk w ON n.parent = w.id)
      SELECT root, lvl, count(*) AS n
      FROM walk GROUP BY root, lvl ORDER BY root, lvl""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH RECURSIVE nodes AS (
          SELECT 'R' || r_regionkey::varchar AS id,
                 NULL::varchar AS parent FROM region
          UNION ALL
          SELECT 'N' || n_nationkey::varchar,
                 'R' || n_regionkey::varchar FROM nation
          UNION ALL
          SELECT 'C' || c_custkey::varchar,
                 'N' || c_nationkey::varchar FROM customer
          WHERE c_custkey <= 300),
        walk AS (
          SELECT id, id AS root, 1 AS lvl FROM nodes WHERE parent IS NULL
          UNION ALL
          SELECT n.id, w.root, w.lvl + 1
          FROM nodes n JOIN walk w ON n.parent = w.id)
        SELECT root, lvl, count(*) AS n
        FROM walk GROUP BY root, lvl ORDER BY root, lvl""")
    },

    // Explicit GROUPING SETS (q19/q32 cover ROLLUP/CUBE).
    GQuery("snow28_grouping_sets", Some("""
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
        CAST(grouping(o_orderpriority)*2 + grouping(o_orderstatus) AS INT) AS gid,
        count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                              (o_orderstatus), ())
      ORDER BY gid, COALESCE(pri,'~'), COALESCE(st,'~')""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
          (grouping(o_orderpriority)*2 + grouping(o_orderstatus))::int AS gid,
          count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
        ORDER BY gid, COALESCE(pri,'~'), COALESCE(st,'~')""")
    },

    // Array function family over real data: size / slice / 0-based
    // position (NULL when absent) / contains / distinct+sort / max.
    GQuery("snow29_array_fns", Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE doc_id <= 50)
      SELECT doc_id,
        CAST(len(ws) AS INT) AS n,
        array_to_string(list_slice(ws, 1, 3), ' ') AS first3,
        CAST(nullif(list_position(ws, 'the'), 0) - 1 AS INT) AS the_pos,
        list_contains(ws, 'the') AS has_the,
        CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
        array_to_string(list_slice(list_sort(list_distinct(ws)), 1, 2), ',')
          AS first2_sorted
      FROM w ORDER BY doc_id""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH w AS (SELECT doc_id, STRTOK_TO_ARRAY(text, ' ') AS ws
                   FROM documents WHERE doc_id <= 50)
        SELECT doc_id,
          ARRAY_SIZE(ws)::int AS n,
          ARRAY_TO_STRING(ARRAY_SLICE(ws, 0, 3), ' ') AS first3,
          ARRAY_POSITION('the', ws)::int AS the_pos,
          ARRAY_CONTAINS('the', ws) AS has_the,
          ARRAY_SIZE(ARRAY_DISTINCT(ws))::int AS n_distinct,
          ARRAY_TO_STRING(ARRAY_SLICE(ARRAY_SORT(ARRAY_DISTINCT(ws)), 0, 2), ',')
            AS first2_sorted
        FROM w ORDER BY doc_id""")
    },

    // CONNECT BY hierarchical query → recursive CTE: a 5-chain forest
    // derived from nation (parent = id - 5; roots 0..4, depth 5).
    GQuery("snow30_connect_by", Some("""
      WITH RECURSIVE emp AS (
        SELECT n_nationkey AS id,
          CASE WHEN n_nationkey < 5 THEN NULL
               ELSE n_nationkey - 5 END AS parent_id
        FROM nation),
      walk AS (
        SELECT id, parent_id, 1 AS lvl FROM emp WHERE parent_id IS NULL
        UNION ALL
        SELECT e.id, e.parent_id, w.lvl + 1
        FROM emp e JOIN walk w ON e.parent_id = w.id)
      SELECT id, CAST(lvl AS INT) AS lvl FROM walk ORDER BY id""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TEMP TABLE cb_emp AS
          SELECT n_nationkey AS id,
            IFF(n_nationkey < 5, NULL, n_nationkey - 5) AS parent_id
          FROM nation;
        SELECT id, LEVEL::int AS lvl FROM cb_emp
        START WITH parent_id IS NULL
        CONNECT BY PRIOR id = parent_id
        ORDER BY id;""")
    },

    // Scalar function batch 2: null-safe equality, encode/decode round
    // trips, string INSERT/overlay, Snowflake GREATEST/LEAST null
    // semantics, date constructors, haversine, TYPEOF/STRIP_NULL_VALUE/
    // JSON_EXTRACT_PATH_TEXT over JSON-text VARIANT.
    GQuery("snow31_fn_scalar2", Some("""
      SELECT n_nationkey AS id,
        (CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END
          IS NOT DISTINCT FROM n_regionkey) AS eqn,
        n_name AS b64_rt,
        'TWFu' AS b64_lit,
        n_name AS hex_rt,
        '4142' AS hex_lit,
        substr(n_name, 1, 1) || 'XX' || substr(n_name, 5) AS ins,
        CASE WHEN n_regionkey = 2 THEN NULL
             ELSE greatest(n_nationkey, n_regionkey * 7) END AS grt,
        CASE WHEN n_regionkey = 2 THEN NULL
             ELSE least(n_nationkey, n_regionkey * 7) END AS lst,
        CAST(make_date(2020, 1 + n_regionkey,
          1 + CAST(n_nationkey % 28 AS INT)) AS VARCHAR) AS dfp,
        CAST(round(2 * 6371 * asin(sqrt(
          pow(sin(radians(n_nationkey - 0) / 2), 2) +
          cos(radians(0)) * cos(radians(CAST(n_nationkey AS DOUBLE))) *
          pow(sin(radians(n_regionkey * 10 - 0) / 2), 2))), 4) AS DOUBLE) AS hav,
        'OBJECT' AS t_obj, 'ARRAY' AS t_arr, 'INTEGER' AS t_int,
        'DECIMAL' AS t_dec, 'BOOLEAN' AS t_bool,
        CAST(NULL AS VARCHAR) AS snv,
        json_extract_string('{"a":{"b":7}}', '$.a.b') AS jept
      FROM nation ORDER BY id""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT n_nationkey AS id,
          EQUAL_NULL(NULLIF(n_regionkey, 2), n_regionkey) AS eqn,
          BASE64_DECODE_STRING(BASE64_ENCODE(n_name)) AS b64_rt,
          BASE64_ENCODE('Man') AS b64_lit,
          HEX_DECODE_STRING(HEX_ENCODE(n_name)) AS hex_rt,
          HEX_ENCODE('AB') AS hex_lit,
          INSERT(n_name, 2, 3, 'XX') AS ins,
          GREATEST(n_nationkey, NULLIF(n_regionkey, 2) * 7) AS grt,
          LEAST(n_nationkey, NULLIF(n_regionkey, 2) * 7) AS lst,
          DATE_FROM_PARTS(2020, 1 + n_regionkey, 1 + (n_nationkey % 28)::int)::varchar AS dfp,
          ROUND(HAVERSINE(0, 0, n_nationkey, n_regionkey * 10), 4)::double AS hav,
          TYPEOF(PARSE_JSON('{"a":1}')) AS t_obj,
          TYPEOF(PARSE_JSON('[1,2]')) AS t_arr,
          TYPEOF(PARSE_JSON('12')) AS t_int,
          TYPEOF(PARSE_JSON('1.5')) AS t_dec,
          TYPEOF(PARSE_JSON('true')) AS t_bool,
          STRIP_NULL_VALUE(PARSE_JSON('null'))::varchar AS snv,
          JSON_EXTRACT_PATH_TEXT('{"a":{"b":7}}', 'a.b') AS jept
        FROM nation ORDER BY id""")
    },

    // Aggregate batch 2: OBJECT_AGG (JSON-text object, sorted keys),
    // MIN_BY/MAX_BY, plus exact count — grouped through a dimension join.
    GQuery("snow32_fn_agg2", Some("""
      SELECT r.r_name AS region,
        '{' || string_agg('"' || n.n_name || '":' || n.n_nationkey,
          ',' ORDER BY n.n_name) || '}' AS nations,
        arg_min(n.n_name, n.n_nationkey) AS first_nation,
        arg_max(n.n_name, n.n_nationkey) AS last_nation,
        count(*) AS n
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1 ORDER BY region""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT r.r_name AS region,
          OBJECT_AGG(n.n_name, n.n_nationkey) AS nations,
          MIN_BY(n.n_name, n.n_nationkey) AS first_nation,
          MAX_BY(n.n_name, n.n_nationkey) AS last_nation,
          count(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 ORDER BY region""")
    },

    // Statistical aggregate surface: correlation/covariance, the REGR_*
    // linear-regression family, population skew/kurtosis, MODE, stddev,
    // WIDTH_BUCKET. Skew/kurtosis oracles recompute the POPULATION
    // moments explicitly (DuckDB's builtins are sample-adjusted; this
    // engine delegates to Spark's population definitions).
    GQuery("snow33_fn_stats", Some("""
      WITH x AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
                        CAST(l_extendedprice AS DOUBLE) AS p,
                        l_linenumber FROM lineitem),
      s AS (SELECT avg(q) AS mx FROM x),
      m AS (SELECT avg(pow(q - mx, 2)) AS m2, avg(pow(q - mx, 3)) AS m3,
                   avg(pow(q - mx, 4)) AS m4 FROM x, s)
      SELECT round(corr(q, p), 4) AS corr_qp,
        round(covar_pop(q, p), 2) AS covp,
        round(covar_samp(q, p), 2) AS covs,
        round(regr_slope(p, q), 3) AS slope,
        round(regr_intercept(p, q), 2) AS icept,
        round(regr_r2(p, q), 4) AS r2,
        regr_count(p, q) AS rn,
        round(regr_avgx(p, q), 4) AS ax,
        round(regr_avgy(p, q), 2) AS ay,
        (SELECT round(m3 / pow(m2, 1.5), 4) FROM m) AS sk,
        (SELECT round(m4 / pow(m2, 2) - 3, 4) FROM m) AS kt,
        (SELECT mode(l_linenumber) FROM x) AS md,
        round(stddev_pop(q), 4) AS sdp,
        round(stddev_samp(q), 4) AS sds,
        CAST(sum(CAST(floor(q / 5) + 1 AS BIGINT)) AS BIGINT) AS wbsum
      FROM x""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
          round(covar_pop(l_quantity, l_extendedprice), 2) AS covp,
          round(covar_samp(l_quantity, l_extendedprice), 2) AS covs,
          round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
          round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
          round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
          regr_count(l_extendedprice, l_quantity) AS rn,
          round(regr_avgx(l_extendedprice, l_quantity), 4) AS ax,
          round(regr_avgy(l_extendedprice, l_quantity), 2) AS ay,
          round(SKEW(l_quantity), 4) AS sk,
          round(KURTOSIS(l_quantity), 4) AS kt,
          MODE(l_linenumber) AS md,
          round(STDDEV_POP(l_quantity), 4) AS sdp,
          round(STDDEV_SAMP(l_quantity), 4) AS sds,
          sum(WIDTH_BUCKET(l_quantity, 0, 55, 11)) AS wbsum
        FROM lineitem""")
    },

    // String surface batch 2: STARTSWITH/ENDSWITH/CONTAINS/SPLIT_PART/
    // TRANSLATE/INITCAP/REPEAT/REVERSE/LPAD/RPAD delegate to Spark
    // builtins of the same shape; REGEXP_LIKE gets Snowflake's
    // full-match anchoring; RTRIMMED_LENGTH expands.
    GQuery("snow34_fn_string2", Some("""
      SELECT p_partkey AS id,
        starts_with(p_name, 'r') AS sw,
        ends_with(p_name, 't') AS ew,
        contains(p_name, 'an') AS ct,
        split_part(p_name, ' ', 2) AS sp,
        translate(p_name, 'aeiou', '12345') AS tr,
        array_to_string(list_transform(string_split(p_name, ' '),
          w -> upper(w[1]) || substr(w, 2)), ' ') AS ic,
        repeat(substr(p_name, 1, 3), 2) AS rp,
        reverse(substr(p_name, 1, 5)) AS rv,
        lpad(substr(p_name, 1, 4), 8, '*') AS lp,
        rpad(substr(p_name, 1, 4), 8, '*') AS rpd,
        regexp_full_match(p_name, '[a-z]+ [a-z]+') AS rl,
        length(rtrim(p_name || '   ')) AS rtl
      FROM part ORDER BY id""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT p_partkey AS id,
          STARTSWITH(p_name, 'r') AS sw,
          ENDSWITH(p_name, 't') AS ew,
          CONTAINS(p_name, 'an') AS ct,
          SPLIT_PART(p_name, ' ', 2) AS sp,
          TRANSLATE(p_name, 'aeiou', '12345') AS tr,
          INITCAP(p_name) AS ic,
          REPEAT(substr(p_name, 1, 3), 2) AS rp,
          REVERSE(substr(p_name, 1, 5)) AS rv,
          LPAD(substr(p_name, 1, 4), 8, '*') AS lp,
          RPAD(substr(p_name, 1, 4), 8, '*') AS rpd,
          REGEXP_LIKE(p_name, '[a-z]+ [a-z]+') AS rl,
          RTRIMMED_LENGTH(p_name || '   ') AS rtl
        FROM part ORDER BY id""")
    },

    // HLL sketch family + APPROX_PERCENTILE as CONTRACT queries (sketches
    // have no cross-engine value equality): the estimate must land within
    // the documented error envelope of the exact answer, and the
    // accumulate→combine→estimate pipeline must agree with one-shot HLL.
    GQuery("snow35_approx_sketches", Some("""
      SELECT true AS hll_ok, true AS hll2_ok, true AS pct_ok""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH ex AS (SELECT count(DISTINCT o_custkey) AS n FROM orders),
        one AS (SELECT HLL(o_custkey) AS e FROM orders),
        two AS (SELECT HLL_ESTIMATE(HLL_COMBINE(sk)) AS e FROM
          (SELECT HLL_ACCUMULATE(o_custkey) AS sk FROM orders
           GROUP BY o_orderpriority) parts),
        med AS (SELECT APPROX_PERCENTILE(l_quantity::double, 0.5) AS p,
                       MEDIAN(l_quantity::double) AS m FROM lineitem)
        SELECT
          (SELECT abs(one.e - ex.n) <= 0.05 * ex.n FROM one, ex) AS hll_ok,
          (SELECT abs(two.e - ex.n) <= 0.05 * ex.n FROM two, ex) AS hll2_ok,
          (SELECT abs(p - m) <= 1.0 FROM med) AS pct_ok""")
    },

    // Date navigation surface: ADD_MONTHS/LAST_DAY/NEXT_DAY pass through,
    // PREVIOUS_DAY expands via next_day arithmetic, DAYOFWEEK shifts to
    // Snowflake's Sunday=0 base, YEAROFWEEKISO lands on the ISO week's
    // Thursday, ILIKE is native both sides.
    GQuery("snow38_fn_dates", Some("""
      SELECT o_orderkey AS id,
        CAST(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS am,
        14.0 AS mb,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS ld,
        CAST(CAST(CAST(o_orderdate AS DATE)
          + INTERVAL ((5 - isodow(o_orderdate) + 6) % 7 + 1) DAY AS DATE) AS VARCHAR) AS nd,
        CAST(CAST(CAST(o_orderdate AS DATE)
          - INTERVAL ((isodow(o_orderdate) - 5 + 6) % 7 + 1) DAY AS DATE) AS VARCHAR) AS pd,
        dayofweek(o_orderdate) AS dw,
        isoyear(o_orderdate) AS ywi,
        CASE WHEN o_orderpriority ILIKE '%urgent%' THEN 1 ELSE 0 END AS il
      FROM orders WHERE o_orderkey < 500 ORDER BY id""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderkey AS id,
          ADD_MONTHS(o_orderdate, 2)::varchar AS am,
          MONTHS_BETWEEN(DATE '1998-03-15', DATE '1997-01-15') AS mb,
          LAST_DAY(o_orderdate)::varchar AS ld,
          NEXT_DAY(o_orderdate, 'FR')::varchar AS nd,
          PREVIOUS_DAY(o_orderdate, 'FR')::varchar AS pd,
          DAYOFWEEK(o_orderdate) AS dw,
          YEAROFWEEKISO(o_orderdate) AS ywi,
          IFF(o_orderpriority ILIKE '%urgent%', 1, 0) AS il
        FROM orders WHERE o_orderkey < 500 ORDER BY id""")
    },

    // Partitioned Iceberg lifecycle: hidden identity partitioning at
    // CREATE, manifest partition values recorded per data file (the
    // metadata-level file-skipping path IcebergLiteSpec asserts), INSERT
    // append preserving the spec, filtered read-back.
    GQuery("snow37_iceberg_partitioned", Some("""
      WITH u AS (SELECT * FROM orders
                 UNION ALL
                 SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT o_orderpriority AS pri, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM u WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE orders_ice
          PARTITION BY (o_orderpriority) AS SELECT * FROM orders;
        INSERT INTO orders_ice
          SELECT * FROM orders WHERE o_orderpriority = '1-URGENT';
        SELECT o_orderpriority AS pri, count(*) AS n,
          sum(o_totalprice::decimal(12,2))::double AS total
        FROM orders_ice WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY 1 ORDER BY 1;""")
    },

    // CREATE SEQUENCE + NEXTVAL: distributed draws (window reservation +
    // monotonically_increasing_id) are unique and step-aligned but not
    // contiguous — Snowflake's own documented contract — so the gate
    // checks the properties, not the values.
    GQuery("snow43_sequence", Some("""
      SELECT count(*) AS n, count(*) AS nd, true AS minok, true AS stepok
      FROM orders""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE SEQUENCE order_ids START = 100 INCREMENT = 2;
        SELECT count(*) AS n, count(DISTINCT id) AS nd,
          min(id) >= 100 AS minok,
          BOOLAND_AGG((id - 100) % 2 = 0) AS stepok
        FROM (SELECT ORDER_IDS.NEXTVAL AS id FROM orders);""")
    },

    // Snowflake-native MinHash SQL surface: MINHASH(k, x) aggregate state,
    // MINHASH_COMBINE fold, APPROXIMATE_JACCARD_INDEX estimate. States are
    // engine-internal, so the gate is a CONTRACT: identical sets estimate
    // exactly 1, ~80%-overlap sets estimate within ±0.15 of true Jaccard
    // (k=128 → σ≈0.035), disjoint sets estimate ≤ 0.15, and combining
    // per-part states equals one-shot hashing.
    GQuery("snow45_minhash_sql", Some("""
      SELECT true AS same_ok, true AS overlap_ok, true AS disjoint_ok,
        true AS combine_ok""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH a AS (SELECT n_name AS w FROM nation),
        b AS (SELECT n_name AS w FROM nation WHERE n_nationkey < 20),
        c AS (SELECT r_name AS w FROM region),
        same_est AS (SELECT APPROXIMATE_JACCARD_INDEX(mh) AS e FROM (
          SELECT MINHASH(128, w) AS mh FROM a
          UNION ALL SELECT MINHASH(128, w) FROM a)),
        ovl_est AS (SELECT APPROXIMATE_SIMILARITY(mh) AS e FROM (
          SELECT MINHASH(128, w) AS mh FROM a
          UNION ALL SELECT MINHASH(128, w) FROM b)),
        dis_est AS (SELECT APPROXIMATE_JACCARD_INDEX(mh) AS e FROM (
          SELECT MINHASH(128, w) AS mh FROM a
          UNION ALL SELECT MINHASH(128, w) FROM c)),
        one_shot AS (SELECT MINHASH(128, w) AS mh FROM a),
        combined AS (SELECT MINHASH_COMBINE(mh) AS mh FROM (
          SELECT MINHASH(128, w) AS mh FROM a WHERE length(w) % 2 = 0
          UNION ALL SELECT MINHASH(128, w) FROM a WHERE length(w) % 2 = 1))
        SELECT
          (SELECT e = 1.0 FROM same_est) AS same_ok,
          (SELECT abs(e - 0.8) <= 0.15 FROM ovl_est) AS overlap_ok,
          (SELECT e <= 0.15 FROM dis_est) AS disjoint_ok,
          (SELECT o.mh = cmb.mh FROM one_shot o, combined cmb) AS combine_ok""")
    },

    // Ordered-set ARRAY_AGG: WITHIN GROUP (ORDER BY …) via struct-sorted
    // collect (Spark's array_agg has no WITHIN GROUP); DISTINCT variant
    // via sorted collect_set. Arrays cross the gate as joined strings.
    GQuery("snow44_array_agg_ordered", Some("""
      SELECT r.r_name AS region,
        string_agg(n.n_name, ',' ORDER BY n.n_nationkey DESC) AS names_desc,
        string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS names_dist,
        count(*) AS n
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1 ORDER BY region""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT r.r_name AS region,
          ARRAY_TO_STRING(ARRAY_AGG(n.n_name)
            WITHIN GROUP (ORDER BY n.n_nationkey DESC), ',') AS names_desc,
          ARRAY_TO_STRING(ARRAY_AGG(DISTINCT n.n_name)
            WITHIN GROUP (ORDER BY n.n_name), ',') AS names_dist,
          count(*) AS n
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 ORDER BY region""")
    },

    // GROUP BY ALL (Snowflake ergonomic grouping — native in Spark 4 and
    // DuckDB alike, gated to pin the pass-through).
    GQuery("snow41_group_by_all", Some("""
      SELECT o_orderpriority AS pri, year(o_orderdate) AS yr, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY ALL ORDER BY pri, yr""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority AS pri, YEAR(o_orderdate) AS yr, count(*) AS n,
          sum(o_totalprice::number(12,2))::double AS total
        FROM orders GROUP BY ALL ORDER BY pri, yr""")
    },

    // Correlated LATERAL subquery (top-1 per outer row) — the general
    // form behind Snowflake's LATERAL; inner (cross-apply) semantics.
    GQuery("snow42_lateral_topn", Some("""
      SELECT n.n_name AS nation, t.top_cust, t.acct
      FROM nation n, LATERAL (
        SELECT c_name AS top_cust, CAST(c_acctbal AS DOUBLE) AS acct
        FROM customer WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 1) t
      ORDER BY nation""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT n.n_name AS nation, t.top_cust, t.acct
        FROM nation n, LATERAL (
          SELECT c_name AS top_cust, c_acctbal::double AS acct
          FROM customer WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 1) t
        ORDER BY nation""")
    },

    // ASOF JOIN SQL surface (MATCH_CONDITION syntax) — the session
    // resolves both input schemas and emits the same single-shuffle
    // union+window form as `AsOfJoin.asOf` (no join operator in the plan;
    // asserted in SessionSpec), so the fact-fact input needs no bound.
    // Oracle is DuckDB's native ASOF JOIN (inner semantics, what the
    // reference actually executes).
    GQuery("snow40_asof_sql", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, v.view_id
      FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS view_id, user_id, ts FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, v.view_id
        FROM p ASOF JOIN v MATCH_CONDITION(p.ts >= v.ts)
          ON p.user_id = v.user_id
        ORDER BY p.event_id""")
    },

    // ASOF LEFT JOIN: unmatched left rows survive with NULL right columns
    // (DuckDB's ASOF LEFT JOIN; Snowflake documents the same
    // keep-unmatched behavior). Same union+window lowering minus the
    // match filter.
    GQuery("snow46_asof_left", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, v.view_id
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS view_id, user_id, ts FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, v.view_id
        FROM p ASOF LEFT JOIN v MATCH_CONDITION(p.ts >= v.ts)
          ON p.user_id = v.user_id
        ORDER BY p.event_id""")
    },

    // Forward ASOF JOIN: first right row at-or-AFTER each left row —
    // MATCH_CONDITION(p.ts <= v.ts) lowers through the same union+window
    // emitter with a DESC carry (plan-asserted no-join in SessionSpec).
    // The matched right timestamp is selected (unique even when several
    // right rows tie on ts), so the oracle can be the tie-insensitive
    // ANSI join+min aggregation DuckDB runs exactly.
    GQuery("snow48_asof_forward", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, min(v.ts) AS vts
      FROM p JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS view_id, user_id, ts FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, v.ts AS vts
        FROM p ASOF JOIN v MATCH_CONDITION(p.ts <= v.ts)
          ON p.user_id = v.user_id
        ORDER BY p.event_id""")
    },

    // Bucketed storage from SQL: CREATE TABLE … CLUSTER BY (k) INTO n
    // BUCKETS maps Snowflake's CLUSTER BY onto Spark bucketed+sorted
    // tables — the repeated-join amortizer (x16) reachable without Scala.
    // Both sides bucket on the join key, so the join plans with ZERO
    // shuffle exchanges (asserted through GraftSession.sql in
    // SessionSpec); this gate proves values round-trip the bucketed
    // write+read against DuckDB on the raw tables.
    GQuery("snow49_bucketed_join", Some("""
      SELECT o.o_orderpriority, count(*) AS n,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE li_bkt CLUSTER BY (l_orderkey) INTO 8 BUCKETS
          AS SELECT l_orderkey, l_extendedprice::number(12,2) AS price,
                    l_discount::number(4,2) AS disc
          FROM lineitem;
        CREATE OR REPLACE TABLE ord_bkt CLUSTER BY (o_orderkey) INTO 8 BUCKETS
          AS SELECT o_orderkey, o_orderpriority FROM orders;
        SELECT o.o_orderpriority, count(*) AS n,
          sum(l.price * (1 - l.disc))::double AS rev
        FROM li_bkt l JOIN ord_bkt o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority;""")
    },

    // Forward ASOF LEFT JOIN: keep-unmatched forward orientation —
    // purchases with no later view survive with NULL vts. Oracle is the
    // LEFT range-join + min (tie-insensitive, NULL for matchless rows).
    GQuery("snow51_asof_forward_left", Some("""
      WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
                 WHERE event_type = 'purchase'),
           v AS (SELECT user_id, ts::TIMESTAMP AS ts
                 FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, min(v.ts) AS vts
      FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")) { (s, dir) =>
      session(s, dir).sql("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT event_id AS view_id, user_id, ts FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, v.ts AS vts
        FROM p ASOF LEFT JOIN v MATCH_CONDITION(p.ts <= v.ts)
          ON p.user_id = v.user_id
        ORDER BY p.event_id""")
    },

    // Bucketed table lifecycle: CTAS CLUSTER BY, INSERT (bucket spec
    // replayed on append), then a bucket-key join + aggregate — proves
    // the whole SQL lifecycle round-trips values, not just the plan
    // shape (zero-exchange asserted in SessionSpec).
    GQuery("snow52_bucketed_insert", Some("""
      WITH ob AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey % 2 = 0)
      SELECT c.c_mktsegment AS seg, count(*) AS n,
        CAST(sum(ob.price) AS DOUBLE) AS total
      FROM ob JOIN customer c ON ob.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY seg""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE ord_ins CLUSTER BY (o_custkey) INTO 4 BUCKETS
          AS SELECT o_orderkey, o_custkey, o_totalprice::number(12,2) AS price
          FROM orders;
        INSERT INTO ord_ins
          SELECT o_orderkey + 10000000, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey % 2 = 0;
        SELECT c.c_mktsegment AS seg, count(*) AS n,
          sum(ob.price)::double AS total
        FROM ord_ins ob JOIN customer c ON ob.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY seg;""")
    },

    // Bucket compaction: after an INSERT every bucket holds one file per
    // append, and Spark only trusts the bucket pre-sort (skipping the
    // join's Sort) with exactly one file per bucket — OPTIMIZE rewrites
    // each bucket to one sorted file (COW, old version time-travelable).
    // SessionSpec asserts the post-OPTIMIZE plan is Exchange- AND
    // Sort-free; this gate proves the compacted values round-trip.
    GQuery("snow53_bucketed_optimize", Some("""
      WITH ob AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders
        UNION ALL
        SELECT o_orderkey + 20000000, o_custkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey % 3 = 0)
      SELECT c.c_mktsegment AS seg, count(*) AS n,
        CAST(sum(ob.price) AS DOUBLE) AS total
      FROM ob JOIN customer c ON ob.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY seg""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE ord_opt CLUSTER BY (o_custkey) INTO 4 BUCKETS
          AS SELECT o_orderkey, o_custkey, o_totalprice::number(12,2) AS price
          FROM orders;
        INSERT INTO ord_opt
          SELECT o_orderkey + 20000000, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey % 3 = 0;
        OPTIMIZE ord_opt;
        SELECT c.c_mktsegment AS seg, count(*) AS n,
          sum(ob.price)::double AS total
        FROM ord_opt ob JOIN customer c ON ob.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY seg;""")
    },

    // Iceberg schema evolution: ADD COLUMN is a METADATA-ONLY commit
    // (new metadata.json, same data files — IcebergLiteSpec asserts the
    // file set is untouched), with the declared schema applied at scan
    // so pre-evolution files surface NULL and the post-evolution INSERT
    // carries real values through the same mixed-schema read group.
    GQuery("snow54_iceberg_schema_evolution", Some("""
      SELECT n_nationkey AS k, n_name AS name,
        CAST(NULL AS DOUBLE) AS score
      FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT n_nationkey, n_name, CAST(n_nationkey AS DOUBLE) * 1.5
      FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 20
      ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ice_evo AS
          SELECT n_nationkey AS k, n_name AS name
          FROM nation WHERE n_nationkey < 10;
        ALTER TABLE ice_evo ADD COLUMN score DOUBLE;
        INSERT INTO ice_evo
          SELECT n_nationkey, n_name, n_nationkey::double * 1.5
          FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 20;
        SELECT k, name, score AS score FROM ice_evo ORDER BY k;""")
    },

    // Iceberg column lifecycle — ALL metadata-only: DROP tombstones the
    // physical name; re-ADDing the same logical name binds a FRESH
    // physical name (old values cannot resurrect — the name-based
    // equivalent of Iceberg field ids); RENAME rebinds the logical name
    // while files keep their physical one; EXPIRE SNAPSHOTS truncates
    // history and reclaims expired manifests/COW dirs while the current
    // snapshot keeps reading (file-level assertions in IcebergLiteSpec).
    GQuery("snow55_iceberg_column_lifecycle", Some("""
      SELECT n_nationkey AS k, n_regionkey AS r,
        CAST(NULL AS VARCHAR) AS name
      FROM nation WHERE n_nationkey < 15
      UNION ALL
      SELECT n_nationkey, n_regionkey, n_name
      FROM nation WHERE n_nationkey >= 15 AND n_nationkey < 20
      ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ice_lc AS
          SELECT n_nationkey AS k, n_name AS name, n_regionkey AS r
          FROM nation WHERE n_nationkey < 15;
        ALTER TABLE ice_lc DROP COLUMN name;
        ALTER TABLE ice_lc ADD COLUMN name VARCHAR;
        ALTER TABLE ice_lc RENAME COLUMN r TO reg;
        INSERT INTO ice_lc
          SELECT n_nationkey, n_regionkey, n_name
          FROM nation WHERE n_nationkey >= 15 AND n_nationkey < 20;
        ALTER TABLE ice_lc EXPIRE SNAPSHOTS;
        SELECT k, reg AS r, name AS name FROM ice_lc ORDER BY k;""")
    },

    // Snowflake table STREAM (CDC): offset at creation, INSERT delta via
    // the in-place append fast path (added files only), then a COW DELETE
    // flips the read to the snapshot diff — the stream reports the NET
    // changes with METADATA$ACTION. Oracle recomputes both sets from the
    // scripted DML.
    GQuery("snow56_stream_cdc", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS v
        FROM orders WHERE o_orderkey % 7 = 0),
      ins AS (
        SELECT o_orderkey + 5000000 AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS v
        FROM orders WHERE o_orderkey % 11 = 0),
      del AS (SELECT k, v FROM base WHERE k % 3 = 0)
      SELECT 'DELETE' AS action, count(*) AS n,
        CAST(sum(v) AS DOUBLE) AS total FROM del
      UNION ALL
      SELECT 'INSERT', count(*), CAST(sum(v) AS DOUBLE) FROM ins
      ORDER BY action""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE strm_src AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v
          FROM orders WHERE o_orderkey % 7 = 0;
        CREATE OR REPLACE STREAM strm_s ON TABLE strm_src;
        INSERT INTO strm_src
          SELECT o_orderkey + 5000000, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey % 11 = 0;
        DELETE FROM strm_src WHERE k % 3 = 0 AND k < 5000000;
        SELECT METADATA$ACTION AS action, count(*) AS n,
          sum(v)::double AS total
        FROM strm_s GROUP BY 1 ORDER BY action;""")
    },

    // Stream consumption lifecycle: a CTAS reading the stream ADVANCES
    // its offset (Snowflake's consume rule — plain SELECTs never do), so
    // the next delta holds only post-consumption changes;
    // SYSTEM$STREAM_HAS_DATA resolves from file-set metadata alone.
    GQuery("snow57_stream_consume", Some("""
      SELECT
        (SELECT count(*) FROM orders WHERE o_orderkey % 17 = 0) AS consumed,
        count(*) AS pending,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS pending_total,
        TRUE AS has_data
      FROM orders WHERE o_orderkey % 19 = 0""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE strm_src2 AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v
          FROM orders WHERE o_orderkey % 13 = 0;
        CREATE OR REPLACE STREAM strm_c ON TABLE strm_src2;
        INSERT INTO strm_src2
          SELECT o_orderkey + 6000000, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey % 17 = 0;
        CREATE OR REPLACE TABLE strm_sink AS
          SELECT k, v FROM strm_c WHERE METADATA$ACTION = 'INSERT';
        INSERT INTO strm_src2
          SELECT o_orderkey + 7000000, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey % 19 = 0;
        SELECT
          (SELECT count(*) FROM strm_sink) AS consumed,
          count(*) AS pending,
          sum(v)::double AS pending_total,
          SYSTEM$STREAM_HAS_DATA('strm_c') AS has_data
        FROM strm_c;""")
    },

    // APPEND_ONLY stream on an Iceberg table: the delta reads ONLY the
    // files the INSERT committed (StreamsSpec asserts the input-file
    // subset) — Iceberg's incremental append scan, O(delta) at any table
    // size. This gate proves the values and metadata action round-trip.
    GQuery("snow58_stream_iceberg_append", Some("""
      SELECT 'INSERT' AS action, count(*) AS n,
        min(n_nationkey + 100) AS min_k, max(n_nationkey + 100) AS max_k
      FROM nation WHERE n_nationkey < 10""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE strm_ice AS
          SELECT n_nationkey AS k, n_name AS name FROM nation;
        CREATE OR REPLACE STREAM strm_i ON TABLE strm_ice APPEND_ONLY = TRUE;
        INSERT INTO strm_ice
          SELECT n_nationkey + 100, n_name FROM nation WHERE n_nationkey < 10;
        SELECT METADATA$ACTION AS action, count(*) AS n,
          min(k) AS min_k, max(k) AS max_k
        FROM strm_i GROUP BY 1 ORDER BY action;""")
    },

    // DYNAMIC TABLE incremental maintenance: a decomposable aggregate
    // (count/sum/max) over a base that then gains an append is refreshed
    // by MERGING agg(delta) into the previous result — O(result + delta),
    // never a base rescan (DynamicTableSpec asserts mode + delta file
    // subset). This gate proves the merged contents equal a from-scratch
    // aggregate over the full base.
    GQuery("snow59_dynamic_table", Some("""
      WITH base AS (
        SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey <= 4000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000)
      SELECT k, count(*) AS n, CAST(sum(price) AS DOUBLE) AS total,
        CAST(max(price) AS DOUBLE) AS hi
      FROM base GROUP BY k ORDER BY k LIMIT 100""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dt_base AS
          SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
          FROM orders WHERE o_orderkey <= 4000;
        CREATE OR REPLACE DYNAMIC TABLE dt_sum TARGET_LAG = '1 minute' AS
          SELECT k, count(*) AS n, sum(price) AS total, max(price) AS hi
          FROM dt_base GROUP BY k;
        INSERT INTO dt_base
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000;
        ALTER DYNAMIC TABLE dt_sum REFRESH;
        SELECT k, n, total::double AS total, hi::double AS hi
        FROM dt_sum ORDER BY k LIMIT 100;""")
    },

    // Manifest column-bounds file pruning: the Iceberg commit records
    // each data file's column min/max from its parquet footer; a
    // selective predicate on a NON-partition column then skips files at
    // plan time (BoundsFilePrune — file-level skip asserted in
    // IcebergLiteSpec; this gate proves the pruned read's VALUES).
    GQuery("snow78_iceberg_bounds_pruning", Some("""
      SELECT count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey BETWEEN 500 AND 600""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ib_t AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders;
        SELECT count(*) AS n, sum(p)::double AS total
        FROM ib_t WHERE k BETWEEN 500 AND 600;""")
    },

    // COUNT(DISTINCT) DYNAMIC TABLE maintained incrementally: the
    // distinct child refines the state sidecar's KEY granularity (one
    // state row per (group, c)), so the append refreshes by state merge
    // and the granular DELETE by ±fold retraction — both non-full
    // (mode-asserted in DynamicTableSpec); this gate proves the final
    // contents equal a from-scratch recompute.
    GQuery("snow79_dynamic_table_count_distinct", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
          CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000),
      survivors AS (SELECT * FROM base WHERE NOT (k % 4 = 1 AND k > 1000))
      SELECT c % 10 AS g, count(DISTINCT c) AS dc, count(*) AS n,
        CAST(sum(p) AS DOUBLE) AS total
      FROM survivors GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE dtd_base AS
          SELECT o_orderkey AS k, o_custkey AS c,
            o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 1000;
        CREATE OR REPLACE DYNAMIC TABLE dtd_dt AS
          SELECT c % 10 AS g, count(DISTINCT c) AS dc, count(*) AS n,
            sum(p) AS total
          FROM dtd_base GROUP BY 1;
        INSERT INTO dtd_base
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000;
        ALTER DYNAMIC TABLE dtd_dt REFRESH;
        DELETE FROM dtd_base WHERE k % 4 = 1 AND k > 1000;
        ALTER DYNAMIC TABLE dtd_dt REFRESH;
        SELECT g, dc, n, total::double AS total FROM dtd_dt ORDER BY g;""")
    },

    // DYNAMIC TABLE over an INNER join: the fact-side INSERT refreshes
    // via the join-delta decomposition Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB —
    // agg(delta) merges into the previous result, so the old fact files
    // are never re-joined (mode + delta-file asserts in DynamicTableSpec).
    // This gate proves the merged contents equal a from-scratch join.
    GQuery("snow60_dynamic_table_join", Some("""
      WITH base AS (
        SELECT n_nationkey AS k, n_regionkey AS rk FROM nation
        UNION ALL
        SELECT n_nationkey + 50, n_regionkey FROM nation)
      SELECT r.r_name AS region, count(*) AS n
      FROM base b JOIN region r ON b.rk = r.r_regionkey
      GROUP BY r.r_name ORDER BY region""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dtj_base AS
          SELECT n_nationkey AS k, n_regionkey AS rk FROM nation;
        CREATE OR REPLACE DYNAMIC TABLE dtj_dt AS
          SELECT r.r_name AS region, count(*) AS n
          FROM dtj_base b JOIN region r ON b.rk = r.r_regionkey
          GROUP BY r.r_name;
        INSERT INTO dtj_base
          SELECT n_nationkey + 50, n_regionkey FROM nation;
        ALTER DYNAMIC TABLE dtj_dt REFRESH;
        SELECT region, n FROM dtj_dt ORDER BY region;""")
    },

    // DYNAMIC TABLE join-delta with BOTH bases appended in one refresh:
    // part 1 (Δfact ⋈ dim_new) catches the new fact rows — including
    // matches against the new dim row — and part 2 (fact_old ⋈ Δdim)
    // catches old fact rows the new dim row now matches. One refresh,
    // O(Δfact ⋈ dim + fact ⋈ Δdim), exact multiset of the full join.
    GQuery("snow61_dynamic_table_join_both", Some("""
      WITH f AS (
        SELECT n_nationkey AS k, n_regionkey AS rk FROM nation
        UNION ALL
        SELECT n_nationkey + 50, n_regionkey FROM nation),
      d AS (
        SELECT r_regionkey AS rk, r_name AS rname FROM region
        WHERE r_regionkey < 4
        UNION ALL
        SELECT 4, 'REGION4')
      SELECT f.k, d.rname FROM f JOIN d ON f.rk = d.rk
      ORDER BY k, rname""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dtb_f AS
          SELECT n_nationkey AS k, n_regionkey AS rk FROM nation;
        CREATE OR REPLACE TABLE dtb_d AS
          SELECT r_regionkey AS rk, r_name AS rname FROM region
          WHERE r_regionkey < 4;
        CREATE OR REPLACE DYNAMIC TABLE dtb_dt AS
          SELECT f.k, d.rname FROM dtb_f f JOIN dtb_d d ON f.rk = d.rk;
        INSERT INTO dtb_f SELECT n_nationkey + 50, n_regionkey FROM nation;
        INSERT INTO dtb_d SELECT 4, 'REGION4';
        ALTER DYNAMIC TABLE dtb_dt REFRESH;
        SELECT k, rname FROM dtb_dt ORDER BY k, rname;""")
    },

    // DYNAMIC TABLE over a 3-base INNER join chain: the Δ-partition
    // identity telescopes — Δ(A⋈B⋈C) = ΔA⋈B_new⋈C_new ⊎ A_old⋈ΔB⋈C_new
    // ⊎ A_old⋈B_old⋈ΔC — so appends on the fact AND one dimension in the
    // same interval still refresh incrementally: the old fact files are
    // never re-joined (mode + delta-file asserts in DynamicTableSpec).
    // This gate proves the telescoped refresh equals a from-scratch join.
    GQuery("snow63_dynamic_table_join3", Some("""
      WITH f AS (
        SELECT n_nationkey AS k, n_regionkey AS rk FROM nation
        UNION ALL
        SELECT n_nationkey + 50, n_regionkey FROM nation),
      d2 AS (
        SELECT n_nationkey, n_name FROM nation
        UNION ALL
        SELECT n_nationkey + 50, n_name FROM nation)
      SELECT r.r_name AS region, count(*) AS n,
        CAST(sum(f.k) AS BIGINT) AS sk
      FROM f JOIN region r ON f.rk = r.r_regionkey
             JOIN d2 ON f.k = d2.n_nationkey
      GROUP BY r.r_name ORDER BY region""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dt3_f AS
          SELECT n_nationkey AS k, n_regionkey AS rk FROM nation;
        CREATE OR REPLACE TABLE dt3_d AS
          SELECT n_nationkey, n_name FROM nation;
        CREATE OR REPLACE DYNAMIC TABLE dt3_dt AS
          SELECT r.r_name AS region, count(*) AS n, sum(f.k) AS sk
          FROM dt3_f f JOIN region r ON f.rk = r.r_regionkey
                       JOIN dt3_d d2 ON f.k = d2.n_nationkey
          GROUP BY r.r_name;
        INSERT INTO dt3_f SELECT n_nationkey + 50, n_regionkey FROM nation;
        INSERT INTO dt3_d SELECT n_nationkey + 50, n_name FROM nation;
        ALTER DYNAMIC TABLE dt3_dt REFRESH;
        SELECT region, n, sk::bigint AS sk FROM dt3_dt ORDER BY region;""")
    },

    // DYNAMIC TABLE with AVG: avg is not itself mergeable (avg(A ⊎ B)
    // is not a function of avg(A) and avg(B)), so the refresh maintains
    // a (sum, count) partial-state sidecar — the classic materialized-
    // view decomposition — merges delta partials into it, and re-derives
    // the visible table by one O(|result|) projection. Two append +
    // refresh cycles prove the state folds ACROSS refreshes (mode +
    // state-rebuild-on-full asserts in DynamicTableSpec). Decimal input:
    // partial sums are exact, so the merged AVG carries no FP-
    // associativity slack before the final rounding.
    GQuery("snow64_dynamic_table_avg", Some("""
      WITH base AS (
        SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey <= 4000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 8000)
      SELECT k % 7 AS g, count(*) AS n,
        round(CAST(CAST(avg(price) AS DECIMAL(16,6)) AS DOUBLE), 4) AS ap,
        CAST(max(price) AS DOUBLE) AS hi
      FROM base GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dta_b AS
          SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
          FROM orders WHERE o_orderkey <= 4000;
        CREATE OR REPLACE DYNAMIC TABLE dta_dt AS
          SELECT k % 7 AS g, count(*) AS n, avg(price) AS ap, max(price) AS hi
          FROM dta_b GROUP BY 1;
        INSERT INTO dta_b
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000;
        ALTER DYNAMIC TABLE dta_dt REFRESH;
        INSERT INTO dta_b
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 8000;
        ALTER DYNAMIC TABLE dta_dt REFRESH;
        SELECT g, n, round(ap::double, 4) AS ap, hi::double AS hi
        FROM dta_dt ORDER BY g;""")
    },

    // DYNAMIC TABLE over EXPRESSIONS of aggregates: sum(x)+1, max-min
    // spread, per-row unit price sum/nullif(count), round(avg, 2) —
    // none is mergeable as a value ((sum+1) partials would double the
    // +1), all decompose into mergeable aggregate parts. The refresh
    // stores each contained aggregate as its own state column, merges
    // delta partials, and re-evaluates the expression recipe over the
    // merged state (classification + recipe from the ANALYZED plan, so
    // every dialect spelling classifies by what it computes). Proves
    // the recipe-derived values equal a from-scratch recompute.
    GQuery("snow65_dynamic_table_derived", Some("""
      WITH base AS (
        SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey <= 6000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 6000)
      SELECT k % 5 AS g,
        CAST(sum(price) + 1 AS DOUBLE) AS sp1,
        CAST(max(price) - min(price) AS DOUBLE) AS spread,
        count(*) * 2 AS n2,
        CAST(round(CAST(avg(price) AS DECIMAL(16,6)), 2) AS DOUBLE) AS ap2
      FROM base GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dtd_b AS
          SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
          FROM orders WHERE o_orderkey <= 6000;
        CREATE OR REPLACE DYNAMIC TABLE dtd_dt AS
          SELECT k % 5 AS g, sum(price) + 1 AS sp1,
            max(price) - min(price) AS spread,
            count(*) * 2 AS n2,
            round(avg(price), 2) AS ap2
          FROM dtd_b GROUP BY 1;
        INSERT INTO dtd_b
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 6000;
        ALTER DYNAMIC TABLE dtd_dt REFRESH;
        SELECT g, sp1::double AS sp1, spread::double AS spread,
          n2, ap2::double AS ap2
        FROM dtd_dt ORDER BY g;""")
    },

    // DYNAMIC TABLE with HAVING: the state keeps EVERY group unfiltered
    // and the predicate re-applies after each merge — groups cross the
    // threshold in both directions across refreshes (count(*) >= n
    // admits new groups as rows accumulate; the avg(price) bound
    // references an aggregate the SELECT list drops, the analyzer's
    // Project-over-Filter-over-Aggregate shape, maintained through a
    // generated helper state column). Proves the filtered
    // materialization equals a from-scratch recompute after two
    // incremental merges.
    GQuery("snow66_dynamic_table_having", Some("""
      WITH base AS (
        SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders WHERE o_orderkey <= 4000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000
        UNION ALL
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey > 8000)
      SELECT k % 7 AS g, count(*) AS n, CAST(sum(price) AS DOUBLE) AS total
      FROM base GROUP BY 1
      HAVING count(*) >= 40 AND CAST(avg(price) AS DOUBLE) > 100000
      ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE dth_b AS
          SELECT o_custkey AS k, o_totalprice::number(12,2) AS price
          FROM orders WHERE o_orderkey <= 4000;
        CREATE OR REPLACE DYNAMIC TABLE dth_dt AS
          SELECT k % 7 AS g, count(*) AS n, sum(price) AS total
          FROM dth_b GROUP BY 1
          HAVING count(*) >= 40 AND avg(price) > 100000;
        INSERT INTO dth_b
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 4000 AND o_orderkey <= 8000;
        ALTER DYNAMIC TABLE dth_dt REFRESH;
        INSERT INTO dth_b
          SELECT o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 8000;
        ALTER DYNAMIC TABLE dth_dt REFRESH;
        SELECT g, n, total::double AS total
        FROM dth_dt ORDER BY g;""")
    },

    // Iceberg small-file compaction: three commits leave ≥3 data files
    // (the shape streaming ingest produces — one file per micro-batch);
    // OPTIMIZE rewrites the small files into one per partition in a
    // single snapshot commit that reads ONLY the small files, O(small
    // bytes) not O(table) (file counts + partial compaction + time
    // travel asserted in IcebergLiteSpec). This gate proves the
    // compacted table's contents are exactly the union of the commits.
    GQuery("snow62_iceberg_compaction", Some("""
      WITH base AS (
        SELECT n_nationkey AS k, n_regionkey AS rk FROM nation
        UNION ALL
        SELECT n_nationkey + 100, n_regionkey FROM nation
        UNION ALL
        SELECT n_nationkey + 200, n_regionkey FROM nation)
      SELECT rk, count(*) AS n, min(k) AS lo, max(k) AS hi
      FROM base GROUP BY rk ORDER BY rk""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ice_cmp AS
          SELECT n_nationkey AS k, n_regionkey AS rk FROM nation;
        INSERT INTO ice_cmp SELECT n_nationkey + 100, n_regionkey FROM nation;
        INSERT INTO ice_cmp SELECT n_nationkey + 200, n_regionkey FROM nation;
        OPTIMIZE ice_cmp;
        SELECT rk, count(*) AS n, min(k) AS lo, max(k) AS hi
        FROM ice_cmp GROUP BY rk ORDER BY rk;""")
    },

    // File-granular COW DML: UPDATE/DELETE on an Iceberg table rewrite
    // ONLY the data files holding matched rows and commit a replace
    // snapshot carrying every other file forward by path (DmlSpec
    // asserts the file sets; this gate proves the visible contents
    // stay exact through a delete + an update that each touch one
    // snapshot's files). At 100 TB this is the difference between a
    // DELETE costing its own footprint and one rewriting the table.
    GQuery("snow67_iceberg_granular_dml", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey <= 1000
          AND NOT (o_orderkey % 3 = 0 AND o_orderkey > 500))
      SELECT c % 7 AS g, count(*) AS n,
        CAST(sum(CASE WHEN k <= 250
          THEN CAST(p * 2 AS DECIMAL(12,2)) ELSE p END) AS DOUBLE) AS total
      FROM base GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE gdml AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 500;
        INSERT INTO gdml
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000;
        DELETE FROM gdml WHERE k % 3 = 0 AND k > 500;
        UPDATE gdml SET p = p * 2 WHERE k <= 250;
        SELECT c % 7 AS g, count(*) AS n, sum(p)::double AS total
        FROM gdml GROUP BY 1 ORDER BY g;""")
    },

    // Table STREAM over a file-granular DML: the CDC read diffs ONLY
    // the replaced files (carried-forward rows cancel in the multiset
    // identity cur∖base = A∖R), so the stream read costs O(changed
    // files), not two table scans — StreamsSpec asserts the
    // "cow-diff-pruned" mode; this gate proves the emitted net rows.
    GQuery("snow68_stream_pruned_diff", Some("""
      SELECT 'DELETE' AS act, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey > 600
        AND o_orderkey <= 1200""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE sdml AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO sdml
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        CREATE OR REPLACE STREAM sdml_strm ON TABLE sdml;
        DELETE FROM sdml WHERE k % 4 = 1 AND k > 600;
        SELECT METADATA$ACTION AS act, count(*) AS n, sum(p)::double AS total
        FROM sdml_strm GROUP BY 1 ORDER BY 1;""")
    },

    // DYNAMIC TABLE retraction: a file-granular DELETE on the base
    // refreshes the DT by folding −agg(removed files) / +agg(replaced
    // files) into the linear (SUM/COUNT/AVG) state — never recomputing
    // and never rereading untouched files (DynamicTableSpec asserts the
    // "incremental-retract-merge" mode and the delta file set; this
    // gate proves the materialization equals a from-scratch recompute,
    // including a group the delete empties out entirely).
    GQuery("snow69_dynamic_table_retract", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey <= 1200
          AND NOT (o_orderkey > 600 AND o_orderkey % 4 = 0))
      SELECT c % 5 AS g, count(*) AS n, CAST(sum(p) AS DOUBLE) AS total,
        round(CAST(CAST(avg(p) AS DECIMAL(16,6)) AS DOUBLE), 4) AS ap
      FROM base GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE rdt_b AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO rdt_b
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        CREATE OR REPLACE DYNAMIC TABLE rdt AS
          SELECT c % 5 AS g, count(*) AS n, sum(p) AS total, avg(p) AS ap
          FROM rdt_b GROUP BY 1;
        DELETE FROM rdt_b WHERE k > 600 AND k % 4 = 0;
        ALTER DYNAMIC TABLE rdt REFRESH;
        SELECT g, n, total::double AS total, round(ap::double, 4) AS ap
        FROM rdt ORDER BY g;""")
    },

    // Join-DT retraction: a file-granular DELETE on the FACT side of a
    // fact⋈dim aggregate DT refreshes through the signed telescoped
    // identity (+part over added files, −part over removed files, dim
    // at O(dim)) — the star-schema rollup stays incremental through
    // row-level DML, the shape that matters at 100 TB where a full
    // refresh re-joins the whole fact table. DynamicTableSpec asserts
    // the "incremental-join-retract-merge" mode and the delta file set.
    GQuery("snow70_dynamic_table_join_retract", Some("""
      SELECT d.c_nationkey AS nk, count(*) AS n,
        CAST(sum(CAST(f.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders f JOIN customer d ON f.o_custkey = d.c_custkey
      WHERE f.o_orderkey <= 1200
        AND NOT (f.o_orderkey > 600 AND f.o_orderkey % 3 = 0)
      GROUP BY 1 ORDER BY nk""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE jr_f AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO jr_f
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        CREATE OR REPLACE TABLE jr_d AS
          SELECT c_custkey AS c, c_nationkey AS nk FROM customer;
        CREATE OR REPLACE DYNAMIC TABLE jr_dt AS
          SELECT d.nk, count(*) AS n, sum(f.p) AS total
          FROM jr_f f JOIN jr_d d ON f.c = d.c
          GROUP BY d.nk;
        DELETE FROM jr_f WHERE k > 600 AND k % 3 = 0;
        ALTER DYNAMIC TABLE jr_dt REFRESH;
        SELECT nk, n, total::double AS total FROM jr_dt ORDER BY nk;""")
    },

    // File-granular MERGE on Iceberg: matched-file detection through the
    // source join, update-projection rewrite of ONLY those files,
    // NOT MATCHED inserts appended in the same replace commit (DmlSpec
    // asserts the carried-forward file paths; this gate proves the
    // merged contents).
    GQuery("snow71_iceberg_granular_merge", Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
          CAST(CASE WHEN o_orderkey > 600 AND o_orderkey <= 700
            THEN CAST(o_totalprice AS DECIMAL(12,2)) * 2
            ELSE CAST(o_totalprice AS DECIMAL(12,2)) END
            AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey <= 1200
        UNION ALL
        SELECT o_orderkey + 20000, CAST(o_totalprice AS DECIMAL(12,2))
        FROM orders WHERE o_orderkey <= 20)
      SELECT CASE WHEN k >= 20000 THEN 1 ELSE 0 END AS grp,
        count(*) AS n, CAST(sum(p) AS DOUBLE) AS total
      FROM base GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE gm_t AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO gm_t
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        MERGE INTO gm_t t USING (
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 700
          UNION ALL
          SELECT o_orderkey + 20000, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey <= 20
        ) s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET p = s.p * 2
        WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.p);
        SELECT CASE WHEN k >= 20000 THEN 1 ELSE 0 END AS grp,
          count(*) AS n, sum(p)::double AS total
        FROM gm_t GROUP BY 1 ORDER BY 1;""")
    },

    // DYNAMIC TABLE regroup: MIN/MAX state columns don't fold
    // invertibly, so a file-granular DELETE refreshes by recomputing
    // ONLY the groups named by the replaced files (a key-IN filter
    // pushed through the aggregate into the base scan) and splicing
    // them over the previous result — never a full recompute
    // (DynamicTableSpec asserts the "incremental-regroup-merge" mode
    // and the delta file set; this gate proves the spliced
    // materialization, including maxima that DROP when their
    // supporting rows are deleted).
    GQuery("snow72_dynamic_table_regroup", Some("""
      WITH base AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey <= 1200
          AND NOT (o_orderkey > 600 AND o_orderkey % 4 = 0))
      SELECT c % 5 AS g, count(*) AS n,
        CAST(min(p) AS DOUBLE) AS lo, CAST(max(p) AS DOUBLE) AS hi,
        CAST(sum(p) AS DOUBLE) AS total
      FROM base GROUP BY 1 ORDER BY g""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE mmdt_b AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO mmdt_b
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        CREATE OR REPLACE DYNAMIC TABLE mmdt AS
          SELECT c % 5 AS g, count(*) AS n, min(p) AS lo, max(p) AS hi,
                 sum(p) AS total
          FROM mmdt_b GROUP BY 1;
        DELETE FROM mmdt_b WHERE k > 600 AND k % 4 = 0;
        ALTER DYNAMIC TABLE mmdt REFRESH;
        SELECT g, n, lo::double AS lo, hi::double AS hi,
          total::double AS total FROM mmdt ORDER BY g;""")
    },

    // DT-over-DT across a MERGE-refreshing base: the base DT's merge
    // refresh swaps its materialization path, which used to degrade
    // every downstream DT to full — now the base publishes its signed
    // row delta (touched groups' rows before/after, parquet sidecars)
    // and the downstream consumes the chain of entries across its
    // refresh gap: a retractable aggregate folds ±Q(delta rows), a
    // stateless transform multiset-splices (DynamicTableSpec asserts
    // the "incremental-dtdelta-*" modes, sidecar-only delta reads, and
    // a 2-entry chain; this gate proves the end state after two full
    // cycles through an agg→transform chain).
    GQuery("snow73_dynamic_table_chain", Some("""
      WITH a AS (
        SELECT o_custkey AS c, count(*) AS n,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders WHERE o_orderkey <= 3000 GROUP BY 1)
      SELECT c, CAST(total * 2 AS DOUBLE) AS dbl
      FROM a WHERE n >= 2 ORDER BY c""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE cht AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 1000;
        CREATE OR REPLACE DYNAMIC TABLE cha AS
          SELECT c, count(*) AS n, sum(p) AS total FROM cht GROUP BY c;
        CREATE OR REPLACE DYNAMIC TABLE chb AS
          SELECT c, total * 2 AS dbl FROM cha WHERE n >= 2;
        INSERT INTO cht
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000;
        ALTER DYNAMIC TABLE cha REFRESH;
        ALTER DYNAMIC TABLE chb REFRESH;
        INSERT INTO cht
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 3000;
        ALTER DYNAMIC TABLE cha REFRESH;
        ALTER DYNAMIC TABLE chb REFRESH;
        SELECT c, dbl::double AS dbl FROM chb ORDER BY c;""")
    },

    // Stream UPDATE attribution: the session logs each UPDATE's
    // before/after file sets; a stream whose offset → current
    // transition chains only UPDATE commits emits Snowflake's
    // METADATA$ISUPDATE = true on both the DELETE (old values) and
    // INSERT (new values) rows — closing the last documented stream
    // deviation (StreamsSpec asserts chain/break/APPEND_ONLY-suppress
    // behavior; this gate proves the emitted pairs over a granular
    // Iceberg UPDATE whose diff reads only the replaced files).
    GQuery("snow74_stream_update_pairs", Some("""
      WITH m AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS p
        FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 600
          AND o_orderkey % 5 = 0)
      SELECT * FROM (
        SELECT 'DELETE' AS act, TRUE AS isupd, count(*) AS n,
          CAST(sum(p) AS DOUBLE) AS total FROM m
        UNION ALL
        SELECT 'INSERT' AS act, TRUE AS isupd, count(*) AS n,
          CAST(sum(CAST(p * 2 AS DECIMAL(12,2))) AS DOUBLE) AS total FROM m)
      ORDER BY act""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE ust AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 300;
        INSERT INTO ust
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 300 AND o_orderkey <= 600;
        CREATE OR REPLACE STREAM ust_s ON TABLE ust;
        UPDATE ust SET p = p * 2 WHERE k > 300 AND k % 5 = 0;
        SELECT METADATA$ACTION AS act, METADATA$ISUPDATE AS isupd,
          count(*) AS n, sum(p)::double AS total
        FROM ust_s GROUP BY 1, 2 ORDER BY act;""")
    },

    // Star rollup over a DT chain: a join-DT whose FACT side is itself
    // a merge-refreshing dynamic table consumes the base's published
    // signed sidecar chain through the telescoped join-retract
    // identity — the rollup stays incremental even though the base's
    // materialization path swaps every refresh (DynamicTableSpec
    // asserts the incremental-join-retract-merge mode and
    // sidecar-only delta reads across a 2-entry chain; this gate
    // proves the end state after two cycles).
    GQuery("snow75_dynamic_table_join_chain", Some("""
      WITH a AS (
        SELECT o_custkey AS c, count(*) AS n,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders WHERE o_orderkey <= 3000 GROUP BY 1)
      SELECT d.c_nationkey AS nk, CAST(sum(a.total) AS DOUBLE) AS total,
        CAST(sum(a.n) AS BIGINT) AS n
      FROM a JOIN customer d ON a.c = d.c_custkey
      GROUP BY 1 ORDER BY nk""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE jct AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 1000;
        CREATE OR REPLACE DYNAMIC TABLE jca AS
          SELECT c, count(*) AS n, sum(p) AS total FROM jct GROUP BY c;
        CREATE OR REPLACE TABLE jcd AS
          SELECT c_custkey AS c, c_nationkey AS nk FROM customer;
        CREATE OR REPLACE DYNAMIC TABLE jcj AS
          SELECT d.nk, sum(a.total) AS total, sum(a.n) AS n
          FROM jca a JOIN jcd d ON a.c = d.c GROUP BY d.nk;
        INSERT INTO jct
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000;
        ALTER DYNAMIC TABLE jca REFRESH;
        ALTER DYNAMIC TABLE jcj REFRESH;
        INSERT INTO jct
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 3000;
        ALTER DYNAMIC TABLE jca REFRESH;
        ALTER DYNAMIC TABLE jcj REFRESH;
        SELECT nk, total::double AS total, n FROM jcj ORDER BY nk;""")
    },

    // Stream on a DYNAMIC TABLE: a merge refresh swaps the DT's
    // materialization, which would force a CDC read into a
    // two-full-snapshot multiset diff — instead the stream consumes
    // the DT's published sidecar chain (touched groups' rows
    // before/after), costing O(changed groups) (StreamsSpec asserts
    // the "dt-chain-diff" mode across two chained refreshes; this
    // gate proves the emitted net rows).
    GQuery("snow76_stream_on_dynamic_table", Some("""
      WITH oldv AS (
        SELECT o_custkey AS c, count(*) AS n,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders WHERE o_orderkey <= 1000 GROUP BY 1),
      newv AS (
        SELECT o_custkey AS c, count(*) AS n,
          sum(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders WHERE o_orderkey <= 3000 GROUP BY 1)
      SELECT * FROM (
        SELECT 'DELETE' AS act, count(*) AS n,
          CAST(sum(oldv.total) AS DOUBLE) AS tot
        FROM oldv JOIN newv ON oldv.c = newv.c
        WHERE oldv.n <> newv.n OR oldv.total <> newv.total
        UNION ALL
        SELECT 'INSERT' AS act, count(*) AS n,
          CAST(sum(newv.total) AS DOUBLE) AS tot
        FROM newv LEFT JOIN oldv ON oldv.c = newv.c
        WHERE oldv.c IS NULL OR oldv.n <> newv.n OR oldv.total <> newv.total)
      ORDER BY act""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE TABLE sot AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 1000;
        CREATE OR REPLACE DYNAMIC TABLE soa AS
          SELECT c, count(*) AS n, sum(p) AS total FROM sot GROUP BY c;
        CREATE OR REPLACE STREAM sos ON TABLE soa;
        INSERT INTO sot
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 2000;
        ALTER DYNAMIC TABLE soa REFRESH;
        INSERT INTO sot
          SELECT o_orderkey, o_custkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 3000;
        ALTER DYNAMIC TABLE soa REFRESH;
        SELECT METADATA$ACTION AS act, count(*) AS n,
          sum(total)::double AS tot
        FROM sos GROUP BY 1 ORDER BY act;""")
    },

    // CHANGES clause: stream semantics over a time-travel span without
    // a stream object — a synthetic offset at the resolved version
    // feeds the SAME delta engine as STREAMs, so the read here rides
    // the pruned cow-diff (the DELETE replaced only some files;
    // StreamsSpec additionally covers UPDATE-chain ISUPDATE,
    // APPEND_ONLY suppression, and the DT sidecar-chain path under
    // CHANGES).
    GQuery("snow77_changes_clause", Some("""
      SELECT 'DELETE' AS act, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey > 600
        AND o_orderkey <= 1200""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE chv_t AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO chv_t
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        DELETE FROM chv_t WHERE k % 4 = 1 AND k > 600;
        SELECT METADATA$ACTION AS act, count(*) AS n, sum(p)::double AS total
        FROM chv_t CHANGES (INFORMATION => DEFAULT)
          BEFORE(STATEMENT => LAST_QUERY_ID())
        GROUP BY 1 ORDER BY 1;""")
    },

    // CHANGES with BOTH bounds: AT(…) END(…) closes the span at a
    // historical version — the two INSERTs are inside the span, the
    // later DELETE is outside and must not appear. The span is
    // pure-append, so the read rides the O(delta) incremental-files
    // path (no snapshot diff).
    GQuery("snow80_changes_end_bound", Some("""
      SELECT 'INSERT' AS act, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1800""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE chv2_t AS
          SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p
          FROM orders WHERE o_orderkey <= 600;
        INSERT INTO chv2_t
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200;
        INSERT INTO chv2_t
          SELECT o_orderkey, o_totalprice::number(12,2)
          FROM orders WHERE o_orderkey > 1200 AND o_orderkey <= 1800;
        DELETE FROM chv2_t WHERE k % 3 = 0;
        SELECT METADATA$ACTION AS act, count(*) AS n, sum(p)::double AS total
        FROM chv2_t CHANGES (INFORMATION => DEFAULT)
          AT(STATEMENT => LAST_QUERY_ID(-4))
          END(STATEMENT => LAST_QUERY_ID(-2))
        GROUP BY 1 ORDER BY 1;""")
    },

    // QUERY_HISTORY table function (round-10 directive #7): the
    // deterministic columns under a literal oracle. RESULT_LIMIT => 2
    // over three tagged statements must return exactly the two MOST
    // RECENT texts — content proves both the limit and the view's
    // recency ordering (oldest-first would surface alpha, not gamma);
    // the output itself is re-ordered by text for the hash compare.
    // COPY option string-literal escape processing + enclosed multi-line
    // fields (round-12 CopyFuzz engine fixes, pinned as a gate):
    // FIELD_DELIMITER='\t' is ONE tab (was a 2-char delimiter before
    // round 12), NULL_IF=('\\N') is the 2-char marker, and a quoted
    // field containing a real newline loads intact (enclosure opts into
    // the whole-file parse). Expected rows recompute from the region
    // table in BOTH dialects; chr(10) (not '\n': Spark literals process
    // the escape, DuckDB's don't) normalizes the embedded newline.
    GQuery("snow82_copy_escaped_options", Some("""
      SELECT r_regionkey AS rkey,
        CASE WHEN r_regionkey = 2 THEN '<null>'
             ELSE r_name || '~line2' END AS nm
      FROM region ORDER BY rkey""")) { (s, dir) =>
      val gs = session(s, dir)
      val stageDir = Files.createTempDirectory("graft_stage_esc").toString
      val rows = graft.Tables.load(s, dir, "region")
        .selectExpr("r_regionkey", "r_name").collect()
        .map(r => (r.getAs[Number]("r_regionkey").intValue,
          r.getAs[String]("r_name"))).sortBy(_._1)
      val text = rows.map { case (k, name) =>
        if (k == 2) s"$k\t\\N"
        else s"$k\t\"$name\nline2\""
      }.mkString("", "\n", "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(stageDir, "r.csv"), text)
      gs.sql(s"CREATE STAGE esc_stage URL='$stageDir'")
      gs.sql("""
        CREATE OR REPLACE TABLE region_esc (r_regionkey INT, r_name VARCHAR);
        COPY INTO region_esc FROM @esc_stage
          FILE_FORMAT = (TYPE = CSV FIELD_DELIMITER = '\t'
            FIELD_OPTIONALLY_ENCLOSED_BY = '"' NULL_IF = ('\\N'));""")
      gs.sql("""
        SELECT r_regionkey AS rkey,
          COALESCE(REPLACE(r_name, chr(10), '~'), '<null>') AS nm
        FROM region_esc ORDER BY rkey""")
    },

    // DATEDIFF counts part BOUNDARIES crossed (Snowflake semantics ==
    // DuckDB date_diff, where the reference executes it), NOT complete
    // intervals (Spark timestampdiff) — the anchor sits mid-range so
    // both signs and every part's boundary lowering are exercised, in
    // alias spellings (yy/mons/wk/dd/hh/mi/s). EXTRACT(second) /
    // DATE_PART('second') are INTEGER seconds (fraction truncated;
    // events ts values all carry micros). The DATEADD clamp probe pins
    // month-end arithmetic (Jan 31 + 1 month = Feb 29 in 2024).
    GQuery("snow83_datediff_boundaries", Some("""
      SELECT
        CAST(sum(date_diff('year', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dy,
        CAST(sum(date_diff('quarter', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dq,
        CAST(sum(date_diff('month', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dm,
        CAST(sum(date_diff('week', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dw,
        CAST(sum(date_diff('day', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dd,
        CAST(sum(date_diff('hour', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dh,
        CAST(sum(date_diff('minute', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS dmi,
        CAST(sum(date_diff('second', TIMESTAMP '2024-01-15 12:30:45', ts)) AS BIGINT) AS ds,
        CAST(sum(date_part('second', ts)) AS BIGINT) AS es,
        CAST(sum(date_part('second', ts)) AS BIGINT) AS dps,
        CAST(max(TIMESTAMP '2024-01-31 05:00:00' + INTERVAL 1 MONTH) AS VARCHAR) AS clamped
      FROM events""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT
          sum(DATEDIFF(yy, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dy,
          sum(DATEDIFF('qtr', '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dq,
          sum(DATEDIFF(mons, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dm,
          sum(DATEDIFF(wk, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dw,
          sum(DATEDIFF(dd, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dd,
          sum(DATEDIFF(hh, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dh,
          sum(DATEDIFF(mi, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS dmi,
          sum(DATEDIFF(s, '2024-01-15 12:30:45'::timestamp, ts))::bigint AS ds,
          sum(EXTRACT(second FROM ts))::bigint AS es,
          sum(DATE_PART('second', ts))::bigint AS dps,
          DATEADD(month, 1, max('2024-01-31 05:00:00'::timestamp))::varchar AS clamped
        FROM events""")
    },

    // String-surface edges the 11th fuzz family guards, pinned under the
    // driver's oracle: 2-arg TRIM family (char-SET strip — Spark only
    // has the TRIM(BOTH … FROM …) syntax form, the rewriter lowers to
    // it), SPLIT_PART with a negative index, CHARINDEX with a start
    // offset (DuckDB has no 3-arg position — the oracle searches the
    // suffix and re-offsets), INSERT (oracle renders slice||repl||slice)
    // and TRANSLATE.
    GQuery("snow84_string_edges", Some("""
      SELECT n_nationkey AS k,
        trim(n_name, 'AEIOU') AS t1,
        ltrim(n_name, 'ABC') AS t2,
        rtrim(n_name, 'ANY') AS t3,
        split_part(n_name, 'A', 2) AS sp,
        split_part(n_name, 'A', -1) AS spn,
        CAST(CASE WHEN strpos(substr(n_name, 3), 'A') = 0 THEN 0
             ELSE strpos(substr(n_name, 3), 'A') + 2 END AS BIGINT) AS ci,
        substr(n_name, 1, 1) || '*' || substr(n_name, 5) AS ins,
        translate(n_name, 'AN', 'xy') AS tr
      FROM nation ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT n_nationkey AS k,
          TRIM(n_name, 'AEIOU') AS t1,
          LTRIM(n_name, 'ABC') AS t2,
          RTRIM(n_name, 'ANY') AS t3,
          SPLIT_PART(n_name, 'A', 2) AS sp,
          SPLIT_PART(n_name, 'A', -1) AS spn,
          CHARINDEX('A', n_name, 3)::bigint AS ci,
          INSERT(n_name, 2, 3, '*') AS ins,
          TRANSLATE(n_name, 'AN', 'xy') AS tr
        FROM nation ORDER BY k""")
    },

    // Numeric-surface edges the 12th fuzz family guards, pinned under
    // the driver's oracle: numeric TRUNC/TRUNCATE toward zero at
    // positive AND negative scales (Spark has no numeric trunc — the
    // rewriter's sign-dispatched floor/ceil in EXACT integer powers),
    // scaled CEIL/FLOOR, ROUND half-away-from-zero, DIV0/DIV0NULL
    // NULL-propagation (divisor MOD k draws real zeros; NULLIF draws
    // real NULLs; operands kept exactly divisible so both engines'
    // decimal division is exact), and sign-follows-dividend MOD. All
    // aggregates sum exact decimals and cast to double at the end.
    GQuery("snow85_numeric_edges", Some("""
      SELECT
        -- DuckDB's decimal-by-int division returns DOUBLE, so every
        -- scale-back multiplies by an exact decimal instead
        CAST(sum(floor(CAST(o_totalprice AS DECIMAL(12,2)) * 10) * 0.1)
          AS DOUBLE) AS t1,
        CAST(sum(floor(CAST(o_totalprice AS DECIMAL(12,2)) * 0.01) * 100)
          AS DOUBLE) AS tm,
        CAST(sum(ceil(CAST(o_totalprice AS DECIMAL(12,2)) * 10) * 0.1)
          AS DOUBLE) AS c1,
        CAST(sum(floor(CAST(o_totalprice AS DECIMAL(12,2)) * 0.001) * 1000)
          AS DOUBLE) AS f3,
        CAST(sum(round(CAST(o_totalprice AS DECIMAL(12,2)), 1))
          AS DOUBLE) AS r1,
        CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 0
          ELSE CAST(o_totalprice AS DECIMAL(12,2)) * 2 *
            (CASE WHEN o_orderkey % 3 = 1 THEN 1.0 ELSE 0.5 END)
          END) AS DOUBLE) AS dv,
        CAST(sum(CASE WHEN nullif(o_orderkey % 3, 1) = 0
            OR nullif(o_orderkey % 3, 1) IS NULL THEN 0
          ELSE CAST(o_totalprice AS DECIMAL(12,2)) * 2 * 0.5 END)
          AS DOUBLE) AS dvn,
        CAST(sum((0 - o_orderkey) % 7) AS BIGINT) AS md
      FROM orders WHERE o_orderkey <= 2000""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT
          sum(TRUNC(o_totalprice::number(12,2), 1))::double AS t1,
          sum(TRUNC(o_totalprice::number(12,2), -2))::double AS tm,
          sum(CEIL(o_totalprice::number(12,2), 1))::double AS c1,
          sum(FLOOR(o_totalprice::number(12,2), -3))::double AS f3,
          sum(ROUND(o_totalprice::number(12,2), 1))::double AS r1,
          sum(DIV0(o_totalprice::number(12,2) * 2, MOD(o_orderkey, 3)))::double AS dv,
          sum(DIV0NULL(o_totalprice::number(12,2) * 2,
            NULLIF(MOD(o_orderkey, 3), 1)))::double AS dvn,
          sum(MOD(0 - o_orderkey, 7))::bigint AS md
        FROM orders WHERE o_orderkey <= 2000""")
    },

    // Snowflake sorts NULLs as the HIGHEST values (ASC → last, DESC →
    // first); Spark's default is the opposite (NULLs lowest) and
    // DuckDB's is NULLS LAST in both directions — under a LIMIT the
    // three defaults select DIFFERENT ROWS, not just a different
    // order. The rewriter appends Snowflake's default to every bare
    // sort item (sortNullsCompensation); the oracle states it
    // explicitly. The DESC key pulls the NULL group into the limited
    // window, so a regression flips the selected row set.
    GQuery("snow86_order_by_nulls", Some("""
      SELECT o_orderkey AS k, nullif(o_orderkey % 7, 3) AS nk
      FROM orders WHERE o_orderkey <= 400
      ORDER BY nk DESC NULLS FIRST, k NULLS LAST LIMIT 15""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderkey AS k, NULLIF(MOD(o_orderkey, 7), 3) AS nk
        FROM orders WHERE o_orderkey <= 400
        ORDER BY nk DESC, k LIMIT 15""")
    },

    // ORDER BY token-boundary edges (round-13 ADVICE): a comment between
    // ORDER and BY, a parenthesized sort item whose inner subquery-free
    // expression must not leak direction, and a column literally named
    // like a frame terminator (`rows`) as a sort key — all under LIMIT,
    // so the null-ordering compensation SELECTS rows.
    GQuery("snow87_order_by_edges", Some("""
      SELECT o_orderkey AS k, nullif(o_orderkey % 5, 2) AS rows
      FROM orders WHERE o_orderkey <= 300
      ORDER BY (nullif(o_orderkey % 5, 2) + 0) DESC NULLS FIRST,
        k NULLS LAST LIMIT 12""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderkey AS k, NULLIF(MOD(o_orderkey, 5), 2) AS rows
        FROM orders WHERE o_orderkey <= 300
        ORDER /* compensate me */ BY (NULLIF(MOD(o_orderkey, 5), 2) + 0)
          DESC, k LIMIT 12""")
    },

    // Avro unload → re-load round trip (round-13 directive #4): COPY INTO
    // @stage writes avro, COPY INTO reads it back; values must survive
    // bit-exact. Oracle reads the source rows directly.
    GQuery("snow88_avro_roundtrip", Some("""
      SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk
      FROM nation ORDER BY k""")) { (s, dir) =>
      val gs = session(s, dir)
      val stagePath = Files.createTempDirectory("graft_avro_gate")
      // OR REPLACE so the gate is rerunnable within one session, and the
      // temp stage directory is deleted after the round trip — the
      // result below is materialized from gate_nation_avro's own storage
      // before cleanup (ADVICE r13 #4)
      gs.sql(s"CREATE OR REPLACE STAGE gate_avro URL='$stagePath'")
      gs.sql("""
        COPY INTO @gate_avro/n FROM
          (SELECT n_nationkey, n_name, n_regionkey FROM nation)
          FILE_FORMAT = (TYPE = AVRO) OVERWRITE = TRUE;
        CREATE OR REPLACE TABLE gate_nation_avro
          (n_nationkey INT, n_name VARCHAR, n_regionkey INT);
        COPY INTO gate_nation_avro FROM @gate_avro/n
          FILE_FORMAT = (TYPE = AVRO);""")
      val res = gs.sql(
        """SELECT n_nationkey AS k, n_name AS nm, n_regionkey AS rk
           FROM gate_nation_avro ORDER BY k""").localCheckpoint()
      def rmTree(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.foreach(rmTree)
        Files.deleteIfExists(p)
      }
      rmTree(stagePath)
      res
    },

    // The HTTP protocol façade as a GATE (round-13 directive #3): the
    // query runs through login → query-request → base64 Arrow IPC and is
    // decoded back into a DataFrame; the oracle hash-compares the wire
    // result itself. Plain wire types only (text/int/double) — the
    // struct-timestamp encoding is pack-validated by graft.VerifyProtocol.
    GQuery("snow89_protocol_wire", Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY pri""")) { (s, dir) =>
      val server = new graft.protocol.SnowflakeServer(s, Some(dir))
      val port = server.start()
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        def post(path: String, body: String, token: Option[String]) = {
          val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST"); conn.setDoOutput(true)
          token.foreach(t => conn.setRequestProperty(
            "Authorization", s"""Snowflake Token="$t""""))
          val os = conn.getOutputStream
          try os.write(body.getBytes("UTF-8")) finally os.close()
          val j = om.readTree(conn.getInputStream); conn.disconnect(); j
        }
        val login = post("/session/v1/login-request", "{}", None)
        require(login.path("success").asBoolean(), login.toString)
        val token = login.path("data").path("token").asText()
        val q = """SELECT o_orderpriority AS pri, count(*) AS n,
          sum(o_totalprice::number(12,2))::double AS total
          FROM orders GROUP BY 1 ORDER BY pri"""
        val resp = post("/queries/v1/query-request",
          om.createObjectNode().put("sqlText", q).toString, Some(token))
        require(resp.path("success").asBoolean(), resp.toString)
        val bytes = java.util.Base64.getDecoder.decode(
          resp.path("data").path("rowsetBase64").asText())
        org.apache.spark.sql.GraftArrow.fromArrowIpcStream(s, bytes)
      } finally server.stop()
    },

    // Chunked wire results under the oracle (round-14 directive #1):
    // with chunkRows=64 a 500-row result ships as an inline first chunk
    // plus 7 addressable chunk URLs, each a STANDALONE Arrow IPC stream
    // — the gate reassembles them exactly like a Snowflake client
    // (token-gated GET per chunk, decode, concatenate in order) and the
    // result must still hash-match DuckDB. Large results are the shape
    // that matters at scale; snow89 pins the single-buffer path.
    GQuery("snow92_protocol_chunked", Some("""
      SELECT event_id AS k, event_type AS t, CAST(value AS DOUBLE) AS v
      FROM events WHERE event_id <= 500 ORDER BY k""")) { (s, dir) =>
      val server = new graft.protocol.SnowflakeServer(s, Some(dir),
        chunkRows = 64)
      val port = server.start()
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        def post(path: String, body: String, token: Option[String]) = {
          val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST"); conn.setDoOutput(true)
          token.foreach(t => conn.setRequestProperty(
            "Authorization", s"""Snowflake Token="$t""""))
          val os = conn.getOutputStream
          try os.write(body.getBytes("UTF-8")) finally os.close()
          val j = om.readTree(conn.getInputStream); conn.disconnect(); j
        }
        def getBytes(path: String, token: String): Array[Byte] = {
          val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestProperty("Authorization",
            s"""Snowflake Token="$token"""")
          try conn.getInputStream.readAllBytes() finally conn.disconnect()
        }
        val login = post("/session/v1/login-request", "{}", None)
        require(login.path("success").asBoolean(), login.toString)
        val token = login.path("data").path("token").asText()
        val q = """SELECT event_id AS k, event_type AS t,
          value::double AS v FROM events WHERE event_id <= 500 ORDER BY k"""
        val resp = post("/queries/v1/query-request",
          om.createObjectNode().put("sqlText", q).toString, Some(token))
        require(resp.path("success").asBoolean(), resp.toString)
        val data = resp.path("data")
        val chunks = data.path("chunks")
        require(chunks.size() > 1,
          s"expected a multi-chunk result, got ${chunks.size()} chunks")
        val parts = org.apache.spark.sql.GraftArrow.fromArrowIpcStream(s,
          java.util.Base64.getDecoder.decode(
            data.path("rowsetBase64").asText())) +:
          (0 until chunks.size()).map { i =>
            org.apache.spark.sql.GraftArrow.fromArrowIpcStream(s,
              getBytes(chunks.get(i).path("url").asText(), token))
          }
        parts.reduce(_.unionAll(_))
      } finally server.stop()
    },

    // Bit operations + TRY_TO_* conversions (round-15 coverage sweep:
    // mapped by the rewriter since round 6 but never gated): BITAND/
    // BITOR/BITXOR lower to native & | ^, shifts to shiftleft/right,
    // ZEROIFNULL to coalesce, TRY_TO_NUMBER/DOUBLE to try-casts whose
    // failure rows are NULL not errors.
    GQuery("snow93_bitops_conversions", Some("""
      SELECT o_orderkey AS k,
        o_orderkey & 255 AS ba,
        o_orderkey | 16 AS bo,
        xor(o_orderkey, 85) AS bx,
        o_orderkey << 2 AS bl,
        o_orderkey >> 1 AS br,
        COALESCE(NULLIF(o_orderkey % 3, 0), 0) AS z,
        CAST(TRY_CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4)
          AS DECIMAL(38,0)) AS DOUBLE) AS tn,
        TRY_CAST(o_orderstatus AS DOUBLE) AS td
      FROM orders WHERE o_orderkey <= 50 ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderkey AS k,
          BITAND(o_orderkey, 255) AS ba,
          BITOR(o_orderkey, 16) AS bo,
          BITXOR(o_orderkey, 85) AS bx,
          BITSHIFTLEFT(o_orderkey, 2) AS bl,
          BITSHIFTRIGHT(o_orderkey, 1) AS br,
          ZEROIFNULL(NULLIF(o_orderkey % 3, 0)) AS z,
          TRY_TO_NUMBER(SUBSTR(o_orderdate::varchar, 1, 4))::double AS tn,
          TRY_TO_DOUBLE(o_orderstatus) AS td
        FROM orders WHERE o_orderkey <= 50 ORDER BY k""")
    },

    // Array flatten/intersection + boolean aggregates + EDITDISTANCE
    // (same coverage sweep): BOOLOR_AGG/BOOLAND_AGG → bool_or/bool_and,
    // EDITDISTANCE → levenshtein, ARRAY_FLATTEN → flatten,
    // ARRAY_INTERSECTION → array_intersect (size-compared: the
    // intersection's element ORDER is engine-specific on both sides).
    GQuery("snow94_array_bool_aggs", Some("""
      SELECT r_name AS k,
        bool_or(n_nationkey % 2 = 0) AS anyeven,
        bool_and(length(n_name) > 5) AS alllong,
        max(levenshtein(n_name, r_name)) AS ed,
        max(len(list_intersect(string_split(n_name, ' '),
          string_split(r_name, ' ')))) AS inter,
        max(array_to_string(flatten([string_split(n_name, ' '),
          string_split(r_name, ' ')]), '|')) AS flat
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT r_name AS k,
          BOOLOR_AGG(n_nationkey % 2 = 0) AS anyeven,
          BOOLAND_AGG(LEN(n_name) > 5) AS alllong,
          MAX(EDITDISTANCE(n_name, r_name)) AS ed,
          MAX(ARRAY_SIZE(ARRAY_INTERSECTION(
            SPLIT(n_name, ' '), SPLIT(r_name, ' ')))) AS inter,
          MAX(ARRAY_TO_STRING(ARRAY_FLATTEN(ARRAY_CONSTRUCT(
            SPLIT(n_name, ' '), SPLIT(r_name, ' '))), '|')) AS flat
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY k""")
    },

    // WITHIN GROUP × DISTINCT × delimiters (round-13 directive #6): a
    // quote-escaped delimiter, a DISTINCT agg with its mandatory
    // same-expression key, and a multi-key mixed-direction ordered
    // collect with an explicit-NULLS nullable key — all per-key
    // Snowflake semantics, oracle rendered with explicit NULLS.
    GQuery("snow90_within_group_distinct", Some("""
      SELECT o_orderpriority AS pri,
        string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS st,
        string_agg(CAST(o_custkey AS VARCHAR), ''''
          ORDER BY o_orderstatus DESC NULLS FIRST,
          o_orderkey ASC NULLS LAST) AS cq,
        string_agg(CAST(o_orderkey AS VARCHAR), ','
          ORDER BY nullif(o_orderkey % 5, 2) ASC NULLS FIRST,
          o_orderkey ASC NULLS LAST) AS nk
      FROM orders WHERE o_orderkey <= 100
      GROUP BY 1 ORDER BY pri""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT o_orderpriority AS pri,
          LISTAGG(DISTINCT o_orderstatus, '|')
            WITHIN GROUP (ORDER BY o_orderstatus) AS st,
          LISTAGG(o_custkey::varchar, '''') WITHIN GROUP (
            ORDER BY o_orderstatus DESC, o_orderkey) AS cq,
          LISTAGG(o_orderkey::varchar, ',') WITHIN GROUP (
            ORDER BY NULLIF(o_orderkey % 5, 2) NULLS FIRST, o_orderkey) AS nk
        FROM orders WHERE o_orderkey <= 100
        GROUP BY 1 ORDER BY pri""")
    },

    // Type-polymorphic TRUNC/DATE_TRUNC (round-13 ADVICE #1): sub-month
    // parts on a TIMESTAMP (Spark's own trunc NULLs these), DATE inputs
    // staying DATE, and alias part spellings — values must match
    // DuckDB's equally polymorphic date_trunc.
    GQuery("snow91_trunc_parts", Some("""
      SELECT event_id AS k,
        CAST(date_trunc('hour', ts) AS VARCHAR) AS th,
        CAST(date_trunc('minute', ts) AS VARCHAR) AS tm,
        CAST(date_trunc('month', CAST(ts AS DATE)) AS VARCHAR) AS dm,
        CAST(date_trunc('week', CAST(ts AS DATE)) AS VARCHAR) AS dw
      FROM events WHERE event_id <= 200 ORDER BY k""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT event_id AS k,
          TRUNC(ts, hh)::varchar AS th,
          DATE_TRUNC('minute', ts)::varchar AS tm,
          TRUNC(ts::date, month)::varchar AS dm,
          DATE_TRUNC(wk, ts::date)::varchar AS dw
        FROM events WHERE event_id <= 200 ORDER BY k""")
    },

    GQuery("snow81_query_history", Some("""
      SELECT * FROM (VALUES ('SELECT ''beta'' AS tag'),
        ('SELECT ''gamma'' AS tag')) AS t(qt) ORDER BY qt""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT 'alpha' AS tag;
        SELECT 'beta' AS tag;
        SELECT 'gamma' AS tag;
        SELECT QUERY_TEXT AS qt
        FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY(RESULT_LIMIT => 2))
        ORDER BY qt;""")
    },

    // Iceberg hidden time partitioning: day(ts) transform through the
    // session DDL, queried back with a range on the REAL ts column (the
    // mirror rule prunes to in-range day directories — asserted at the
    // file level in IcebergLiteSpec; this gate proves values round-trip).
    GQuery("snow47_iceberg_day_transform", Some("""
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY 1 ORDER BY d""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE events_daily
          PARTITION BY (day(ts))
          AS SELECT event_id, user_id, ts, value FROM events;
        SELECT ts::date::varchar AS d, count(*) AS n,
          sum(value::number(12,2))::double AS total
        FROM events_daily
        WHERE ts >= '2024-01-10 00:00:00'::timestamp
          AND ts < '2024-01-15 00:00:00'::timestamp
        GROUP BY 1 ORDER BY d;""")
    },

    // Integral identity partitioning through the session: c_nationkey
    // partitions write the zi (order-preserving zero-padded) shadow
    // encoding, so the BETWEEN range on the REAL column file-prunes
    // (file-level skip asserted in IcebergLiteSpec; this gate proves
    // values round-trip the partitioned write + pruned read). Identity
    // partitioning is for BOUNDED-cardinality keys — nationkey is 25
    // dirs at any SF; a high-cardinality int belongs under bucket(),
    // not identity (a per-user partition would be a tiny-file storm).
    GQuery("snow50_iceberg_int_partition", Some("""
      SELECT c_nationkey, count(*) AS n,
        CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM customer
      WHERE c_nationkey BETWEEN 5 AND 15
      GROUP BY c_nationkey ORDER BY c_nationkey""")) { (s, dir) =>
      session(s, dir).sql("""
        CREATE OR REPLACE ICEBERG TABLE cust_by_nation
          PARTITION BY (c_nationkey)
          AS SELECT c_custkey, c_nationkey, c_acctbal FROM customer;
        SELECT c_nationkey, count(*) AS n,
          sum(c_acctbal::number(12,2))::double AS total
        FROM cust_by_nation
        WHERE c_nationkey BETWEEN 5 AND 15
        GROUP BY c_nationkey ORDER BY c_nationkey;""")
    },

    // APPROX_TOP_K (Snowflake's Space-Saving heavy hitters → Spark 4's
    // native approx_top_k, same (expr, k, counters) signature). With
    // counters ≥ distinct values the sketch is exact, so the oracle is
    // the exact top-k — the same guarantee Snowflake documents.
    GQuery("snow39_approx_topk", Some("""
      SELECT event_type AS et, count(*) AS n FROM events
      GROUP BY 1 ORDER BY n DESC, et LIMIT 3""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT x.item AS et, x.count AS n
        FROM (SELECT explode(tk) AS x FROM
          (SELECT APPROX_TOP_K(event_type, 3, 64) AS tk FROM events))
        ORDER BY n DESC, et""")
    },

    // CONDITIONAL_TRUE_EVENT: running count of rows satisfying the
    // predicate within the window — Snowflake's sessionization primitive.
    GQuery("snow36_cond_event", Some("""
      SELECT user_id, event_id,
        CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
      FROM events WHERE user_id < 20
      ORDER BY user_id, event_id""")) { (s, dir) =>
      session(s, dir).sql("""
        SELECT user_id, event_id,
          CONDITIONAL_TRUE_EVENT(value > 50) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS grp
        FROM events WHERE user_id < 20
        ORDER BY user_id, event_id""")
    }
  )
}
