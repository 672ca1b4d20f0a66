"""Declarative data-quality constraints (operators/constraints)."""

import pytest

from dbm_nca_ph_etl_spark.operators import constraints as C


class TestCheckConstraints:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "O", 10.0, "ok@x.com"),
                (2, "F", -5.0, "bad"),       # range + expression violations
                (2, "P", 20.0, None),        # duplicate id; null email passes matches
                (None, "Z", 30.0, "a@b.io"), # null id; unaccepted status
            ],
            "id long, status string, amount double, email string",
        )

    def test_all_kinds_count_violations(self, spark):
        got = {
            r.constraint: (r.kind, r.n_violations)
            for r in C.check_constraints(
                self._df(spark),
                [
                    C.not_null("id_nn", "id"),
                    C.unique("id_uq", "id"),
                    C.in_range("amt_rng", "amount", 0.0, 25.0),
                    C.accepted_values("status_ok", "status", "O", "F", "P"),
                    C.matches("email_fmt", "email", "^[^@]+@[^@]+$"),
                    C.expression("amt_pos", "amount > 0.0"),
                ],
            ).collect()
        }
        assert got["id_nn"] == ("not_null", 1)
        assert got["id_uq"] == ("unique", 1)     # 2 rows share id=2 -> 1 extra
        assert got["amt_rng"] == ("range", 2)    # -5 and 30
        assert got["status_ok"] == ("accepted_values", 1)  # 'Z'
        assert got["email_fmt"] == ("matches", 1)  # 'bad'; NULL passes
        assert got["amt_pos"] == ("expression", 1)  # -5

    def test_foreign_key_orphans(self, spark):
        child = self._df(spark)
        parent = spark.createDataFrame([(1,)], "pid long")
        got = {
            r.constraint: r.n_violations
            for r in C.check_constraints(
                child,
                [C.foreign_key("fk", "id", "p", "pid")],
                parents={"p": parent},
            ).collect()
        }
        assert got["fk"] == 2  # the two id=2 rows; NULL child passes

    def test_row_local_rules_share_one_scan(self, spark):
        plan = (
            C.check_constraints(
                self._df(spark),
                [
                    C.not_null("a", "id"),
                    C.in_range("b", "amount", 0.0, 1.0),
                    C.expression("c", "amount > 0.0"),
                ],
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan ExistingRDD") == 1  # one pass, three rules

    def test_guards(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError):
            C.check_constraints(df, [C.not_null("x", "id"), C.not_null("x", "id")])
        with pytest.raises(ValueError):
            C.check_constraints(
                df, [C.foreign_key("fk", "id", "missing", "pid")]
            )
        with pytest.raises(ValueError):
            C.Constraint("bad", "nonsense")
