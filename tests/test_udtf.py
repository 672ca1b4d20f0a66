"""Python UDTF extension surface (SURVEY §2.10)."""

from dbm_nca_ph_etl_spark.functions.table_functions import register_table_functions


class TestParseKv:
    def test_sql_lateral_and_edge_cases(self, spark):
        register_table_functions(spark)
        spark.createDataFrame(
            [
                (1, "a=1;b=2"),
                (2, "broken;c=3"),   # malformed entry skipped
                (3, ""),             # empty → no rows
                (4, None),           # null → no rows
                (5, "=v;d="),        # empty key skipped, empty value kept
            ],
            "id long, cfg string",
        ).createOrReplaceTempView("cfgs")
        got = sorted(
            tuple(r)
            for r in spark.sql(
                "SELECT s.id, t.key, t.value FROM cfgs s, LATERAL parse_kv(s.cfg) t"
            ).collect()
        )
        assert got == [
            (1, "a", "1"),
            (1, "b", "2"),
            (2, "c", "3"),
            (5, "d", ""),
        ]

    def test_reregistration_is_idempotent(self, spark):
        register_table_functions(spark)
        register_table_functions(spark)
        assert spark.sql("SELECT * FROM parse_kv('x=y')").collect()[0][0] == "x"
